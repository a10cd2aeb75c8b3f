"""Trajectory plotting helpers.

Counterpart of the reference Plots.jl recipes (reference src/utils.jl:98-132,
problems/car_escape.jl plot_escape, problems/car_3obs.jl plot_car_3obj).
Matplotlib is optional — import errors surface only when plotting is used.
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


# --------------------------------------------------------- live plotting
#
# Counterpart of the reference live_plotting (reference
# src/solvers/ilqr/ilqr_methods.jl:65-75): the reference display()s a plot
# of X or U every accepted iteration. Here the solver body runs under jit,
# so iLQROptions(live_plotting='state'|'control') emits a
# jax.debug.callback to `live_plot_callback`, which renders to
# ``live_plot_<kind>.png`` (headless Agg default). Replace the writer with
# ``set_live_plot_writer(fn)`` for interactive backends or custom sinks —
# fn(kind: str, traj: np.ndarray (N, dim), it: int).

_live_plot_writer = None


def set_live_plot_writer(fn):
    """Override the live-plotting sink (None restores the PNG default)."""
    global _live_plot_writer
    _live_plot_writer = fn


def live_plot_callback(kind, traj, it):
    """Host-side live-plot hook invoked from inside the jitted iLQR loop."""
    traj = np.asarray(traj)
    it = int(it)
    if _live_plot_writer is not None:
        _live_plot_writer(kind, traj, it)
        return
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(traj)
    ax.set_title(f"{'State' if kind == 'state' else 'Control'} trajectory "
                 f"(iLQR iteration {it})")
    ax.set_xlabel("knot")
    fig.tight_layout()
    fig.savefig(f"live_plot_{kind}.png", dpi=100)
    plt.close(fig)


def plot_trajectory(X, U=None, dt=None, labels=None, title="trajectory",
                    path=None):
    """State (and optionally control) time series (reference utils.jl:98-118)."""
    plt = _plt()
    X = np.asarray(X)
    rows = 2 if U is not None else 1
    fig, axes = plt.subplots(rows, 1, figsize=(8, 3 * rows), squeeze=False)
    t = np.arange(X.shape[0]) * (dt or 1.0)
    for i in range(X.shape[1]):
        lbl = labels[i] if labels else f"x{i}"
        axes[0][0].plot(t, X[:, i], label=lbl)
    axes[0][0].set_title(title)
    axes[0][0].legend(fontsize=7)
    if U is not None:
        U = np.asarray(U)
        tu = np.arange(U.shape[0]) * (dt or 1.0)
        for i in range(U.shape[1]):
            axes[1][0].step(tu, U[:, i], label=f"u{i}", where="post")
        axes[1][0].legend(fontsize=7)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_obstacle_course(X, circles, x0=None, xf=None, X_guess=None,
                         title="", path=None):
    """2D course with circular obstacles (reference plot_escape,
    problems/car_escape.jl:74-83)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 6))
    for c in circles:
        ax.add_patch(plt.Circle((c[0], c[1]), c[2], color="0.6"))
    if X_guess is not None:
        Xg = np.asarray(X_guess)
        ax.plot(Xg[:, 0], Xg[:, 1], "--", color="purple", label="guess")
    X = np.asarray(X)
    ax.plot(X[:, 0], X[:, 1], color="tab:blue", lw=2, label="solution")
    if x0 is not None:
        ax.plot(x0[0], x0[1], "o", color="red")
    if xf is not None:
        ax.plot(xf[0], xf[1], "o", color="green")
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_scene_2d(X, circles=(), x0=None, xf=None, title="scene",
                  path=None, trails=None, xlim=None, ylim=None):
    """Top-down 2D scene: obstacle circles + trajectory (reference
    plot_escape, problems/car_escape.jl:49-64 / plot_car_3obj,
    problems/car_3obs.jl). ``trails`` adds extra labeled trajectories
    (e.g. the infeasible seed)."""
    plt = _plt()
    X = np.asarray(X)
    fig, ax = plt.subplots(figsize=(7, 7))
    for (cx, cy, r) in circles:
        ax.add_patch(plt.Circle((cx, cy), r, color="#888", alpha=0.6,
                                zorder=1))
    if trails:
        for lbl, Xt in trails.items():
            Xt = np.asarray(Xt)
            ax.plot(Xt[:, 0], Xt[:, 1], "--", lw=1.2, label=lbl, zorder=2)
    ax.plot(X[:, 0], X[:, 1], "-o", ms=2.5, lw=1.8, color="#0b6e4f",
            label="solution", zorder=3)
    if x0 is not None:
        ax.plot([x0[0]], [x0[1]], "s", ms=9, color="#1f77b4", label="x0")
    if xf is not None:
        ax.plot([xf[0]], [xf[1]], "*", ms=14, color="#d62728", label="xf")
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.legend(fontsize=8)
    if xlim:
        ax.set_xlim(*xlim)
    if ylim:
        ax.set_ylim(*ylim)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_maze(X, cylinders=(), path=None, title="quadrotor maze"):
    """Maze scene: top-down (x, y) view with the cylinder field + an
    altitude strip (reference quadrotor_maze MeshCat section,
    examples/IROS_2019/quadrotor_maze.jl:93-190 — here as a static
    figure; see ``trajectory_html`` for the interactive 3D view)."""
    plt = _plt()
    X = np.asarray(X)
    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(7, 9), gridspec_kw={"height_ratios": [4, 1]})
    for (cx, cy, r) in cylinders:
        ax.add_patch(plt.Circle((cx, cy), r, color="#888", alpha=0.6))
    ax.plot(X[:, 0], X[:, 1], "-o", ms=2.5, lw=1.8, color="#0b6e4f")
    ax.plot([X[0, 0]], [X[0, 1]], "s", ms=9, color="#1f77b4", label="x0")
    ax.plot([X[-1, 0]], [X[-1, 1]], "*", ms=14, color="#d62728", label="xf")
    ax.set_aspect("equal")
    ax.set_title(title + " (top-down)")
    ax.legend(fontsize=8)
    ax2.plot(np.arange(X.shape[0]), X[:, 2], color="#0b6e4f")
    ax2.set_ylabel("z [m]")
    ax2.set_xlabel("knot")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def trajectory_html(out_path, X, cylinders=(), title="trajectory",
                    z_range=(0.0, 20.0)):
    """Standalone interactive 3D trajectory viewer — a single HTML file
    with an orbiting orthographic canvas (drag to rotate, wheel to zoom),
    zero external dependencies (works offline; the reference's MeshCat
    visualization needs a running server + WebGL assets)."""
    X = np.asarray(X, float)
    pts = [[round(float(a), 3) for a in row[:3]] for row in X]
    cyls = [[round(float(a), 3) for a in c] for c in cylinders]
    html = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>%TITLE%</title>
<style>body{margin:0;background:#15181c;color:#eee;font:13px sans-serif}
#hud{position:fixed;top:8px;left:10px}</style></head>
<body><div id="hud">%TITLE% — drag to orbit, wheel to zoom</div>
<canvas id="c"></canvas><script>
const PTS=%PTS%; const CYL=%CYL%; const ZR=%ZR%;
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let az=-1.0,el=0.5,zoom=1.0;
function resize(){cv.width=innerWidth;cv.height=innerHeight;draw();}
addEventListener('resize',resize);
let drag=null;
cv.addEventListener('mousedown',e=>drag=[e.clientX,e.clientY]);
addEventListener('mouseup',()=>drag=null);
addEventListener('mousemove',e=>{if(!drag)return;
 az+=(e.clientX-drag[0])*0.008;el+=(e.clientY-drag[1])*0.008;
 el=Math.max(-1.5,Math.min(1.5,el));drag=[e.clientX,e.clientY];draw();});
cv.addEventListener('wheel',e=>{zoom*=e.deltaY<0?1.1:0.9;draw();e.preventDefault();});
let cx=0,cy=0,cz=0,scale=1;
(function(){let lo=[1e9,1e9,1e9],hi=[-1e9,-1e9,-1e9];
 for(const p of PTS)for(let i=0;i<3;i++){lo[i]=Math.min(lo[i],p[i]);hi[i]=Math.max(hi[i],p[i]);}
 cx=(lo[0]+hi[0])/2;cy=(lo[1]+hi[1])/2;cz=(lo[2]+hi[2])/2;
 scale=1.2*Math.max(hi[0]-lo[0],hi[1]-lo[1],hi[2]-lo[2],1);})();
function proj(p){const ca=Math.cos(az),sa=Math.sin(az),ce=Math.cos(el),se=Math.sin(el);
 const x=p[0]-cx,y=p[1]-cy,z=p[2]-cz;
 const u=ca*x+sa*y, v=-sa*x+ca*y;
 const w=ce*z-se*v, d=se*z+ce*v;
 const s=zoom*Math.min(cv.width,cv.height)/scale;
 return [cv.width/2+u*s, cv.height/2-w*s, d];}
function line(a,b,col,w){ctx.strokeStyle=col;ctx.lineWidth=w;
 ctx.beginPath();ctx.moveTo(a[0],a[1]);ctx.lineTo(b[0],b[1]);ctx.stroke();}
function circle3(cx0,cy0,z,r,col){let prev=null;ctx.strokeStyle=col;ctx.lineWidth=1;
 ctx.beginPath();for(let i=0;i<=24;i++){const t=i/24*2*Math.PI;
 const p=proj([cx0+r*Math.cos(t),cy0+r*Math.sin(t),z]);
 if(prev)ctx.lineTo(p[0],p[1]);else ctx.moveTo(p[0],p[1]);prev=p;}ctx.stroke();}
function draw(){ctx.fillStyle='#15181c';ctx.fillRect(0,0,cv.width,cv.height);
 for(const c of CYL){circle3(c[0],c[1],ZR[0],c[2],'#566');
  circle3(c[0],c[1],ZR[1],c[2],'#566');
  for(let k=0;k<4;k++){const t=k/4*2*Math.PI;
   line(proj([c[0]+c[2]*Math.cos(t),c[1]+c[2]*Math.sin(t),ZR[0]]),
        proj([c[0]+c[2]*Math.cos(t),c[1]+c[2]*Math.sin(t),ZR[1]]),'#455',1);}}
 for(let i=1;i<PTS.length;i++)
  line(proj(PTS[i-1]),proj(PTS[i]),'#35d07f',2);
 const p0=proj(PTS[0]),p1=proj(PTS[PTS.length-1]);
 ctx.fillStyle='#4aa3ff';ctx.fillRect(p0[0]-4,p0[1]-4,8,8);
 ctx.fillStyle='#ff5a5a';ctx.beginPath();ctx.arc(p1[0],p1[1],5,0,7);ctx.fill();}
resize();
</script></body></html>"""
    html = (html.replace("%TITLE%", title)
                .replace("%PTS%", repr(pts))
                .replace("%CYL%", repr(cyls))
                .replace("%ZR%", repr([float(z_range[0]), float(z_range[1])])))
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
