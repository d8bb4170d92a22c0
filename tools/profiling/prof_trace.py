"""Op-level self-time profile of a render (the methodology PERFORMANCE.md
documents: jax.profiler trace -> trace.json -> leaf-fusion self-times).

Usage: python tools/profiling/prof_trace.py [scene] [res] [n_iters]
Prints the top-20 device ops by total self time plus the frame time.
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import jax

from c_raytracer_tpu.accel import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene

SCENE = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/scenes/scene1.json"
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3

scene = load_scene(SCENE, mesh_root="/root/reference")
if scene.static.n_triangles >= 512:
    scene = reorder_scene(scene)
fn = make_renderer(scene.static, RenderConfig(), RES, RES)
img, z = fn(scene.params, jax.random.PRNGKey(0))
img.block_until_ready()

t0 = time.perf_counter()
for i in range(N):
    img, z = fn(scene.params, jax.random.PRNGKey(i))
    img.block_until_ready()
frame = (time.perf_counter() - t0) / N
print(f"frame: {frame*1000:.1f} ms")

logdir = tempfile.mkdtemp(prefix="crt_prof_")
with jax.profiler.trace(logdir):
    for i in range(N):
        img, z = fn(scene.params, jax.random.PRNGKey(i))
        img.block_until_ready()

paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True)
if not paths:
    print("no trace written (tunnel device may not support profiling)")
    sys.exit(1)
with gzip.open(paths[0], "rt") as f:
    trace = json.load(f)

# device-lane complete events only, keyed by op name
pids = set()
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        name = ev.get("args", {}).get("name", "")
        if "TPU" in name or "/device:" in name or "Chip" in name:
            pids.add(ev["pid"])

# self time = dur - sum(direct children dur), per (pid, tid) lane
by_lane = {}
for ev in trace["traceEvents"]:
    if ev.get("ph") == "X" and ev.get("pid") in pids:
        by_lane.setdefault((ev["pid"], ev.get("tid")), []).append(ev)

tot = {}
for lane in by_lane.values():
    lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0.0)))
    stack = []  # (end_ts, name, child_dur_accum index in selfs list)
    selfs = []
    for ev in lane:
        ts, dur = ev["ts"], ev.get("dur", 0.0)
        while stack and stack[-1][0] <= ts:
            stack.pop()
        if stack:
            selfs[stack[-1][2]][1] += dur  # child time of parent
        selfs.append([ev["name"], 0.0, dur])
        stack.append((ts + dur, ev["name"], len(selfs) - 1))
    for name, child, dur in selfs:
        tot[name] = tot.get(name, 0.0) + max(dur - child, 0.0)

items = sorted(tot.items(), key=lambda kv: -kv[1])
alltime = sum(tot.values())
print(f"total device self time: {alltime/1e3/N:.1f} ms/frame over {N} frames")
for name, us in items[:25]:
    print(f"{us/1e3/N:9.2f} ms  {100*us/alltime:5.1f}%  {name[:110]}")
