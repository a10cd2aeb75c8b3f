"""Solve-and-visualize the showcase problems (reference examples/IROS_2019
MeshCat + PGFPlots sections, e.g. quadrotor_maze.jl:93-190 and
plot_escape/plot_car_3obj recipes).

Produces, under examples/out/:
- car_escape.png       top-down 170-circle trap scene + escape trajectory
- car_3obs.png         three-obstacle avoidance scene
- parallel_park.png    parallel-park scene (workspace box)
- quadrotor_maze.png   top-down maze + altitude strip
- quadrotor_maze.html  standalone interactive 3D viewer (drag-orbit, zero
                       dependencies — the TPU-native stand-in for MeshCat)

Usage: python examples/visualize.py [problem ...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "out")


def _solve(name):
    import jax.numpy as jnp
    from trajopt_tpu.problems import zoo as probs
    from trajopt_tpu.problems.tuned import tuned_altro_options
    from trajopt_tpu.solvers import altro as alt

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    prob = probs.PROBLEMS[name](dtype=dtype)
    res = alt.altro_solve(prob, tuned_altro_options(name))
    print(f"{name}: c_max {float(res.c_max):.2e}  J {float(res.J):.4f}  "
          f"iters {int(res.iterations)}")
    return prob, res


def car_escape():
    from trajopt_tpu.problems.zoo import _escape_circles
    from trajopt_tpu.utils.plotting import plot_scene_2d

    prob, res = _solve("car_escape")
    plot_scene_2d(np.asarray(res.X), _escape_circles(),
                  x0=np.asarray(prob.x0), xf=np.asarray(prob.xf),
                  trails={"infeasible seed": np.asarray(prob.X)},
                  title="car escape (ALTRO, infeasible start)",
                  path=os.path.join(OUT, "car_escape.png"))


def car_3obs():
    from trajopt_tpu.utils.plotting import plot_scene_2d

    from trajopt_tpu.problems.zoo import CAR_3OBS_CIRCLES

    prob, res = _solve("car_3obs")
    plot_scene_2d(np.asarray(res.X), CAR_3OBS_CIRCLES, x0=np.asarray(prob.x0),
                  xf=np.asarray(prob.xf), title="car 3-obstacle",
                  path=os.path.join(OUT, "car_3obs.png"))


def parallel_park():
    from trajopt_tpu.utils.plotting import plot_scene_2d

    prob, res = _solve("parallel_park")
    plot_scene_2d(np.asarray(res.X), (), x0=np.asarray(prob.x0),
                  xf=np.asarray(prob.xf), title="parallel park",
                  path=os.path.join(OUT, "parallel_park.png"))


def quadrotor_maze():
    from trajopt_tpu.problems.zoo import _maze_cylinders
    from trajopt_tpu.utils.plotting import plot_maze, trajectory_html

    prob, res = _solve("quadrotor_maze")
    X = np.asarray(res.X)
    cyl = _maze_cylinders()
    plot_maze(X, cyl, path=os.path.join(OUT, "quadrotor_maze.png"))
    trajectory_html(os.path.join(OUT, "quadrotor_maze.html"), X, cyl,
                    title="quadrotor maze (ALTRO)", z_range=(0.0, 20.0))


SCENES = {
    "car_escape": car_escape,
    "car_3obs": car_3obs,
    "parallel_park": parallel_park,
    "quadrotor_maze": quadrotor_maze,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    names = sys.argv[1:] or list(SCENES)
    for n in names:
        SCENES[n]()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
