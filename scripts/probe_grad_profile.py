"""Op-level profile of the detached-diff grad step (the bench --grad
workload): capture a jax.profiler trace of 3 steps on the real chip,
convert the xplane with xprof's hlo_stats tool, and print the top HLO
ops by self time.  Answers where the "structural" normal-chain
milliseconds actually go (DESIGN round 3 #8).

Usage: python scripts/probe_grad_profile.py [tool]
  tool: hlo_stats (default) | op_profile | framework_op_stats
"""
import dataclasses
import glob
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracinginonesemester_tpu as rt
from raytracinginonesemester_tpu.core.camera import Camera
from raytracinginonesemester_tpu.diff.inverse import extract_params, render_loss

W, H = 960, 540
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scene = rt.load_scene(os.path.join(
    repo, "tests/assets/scenes/gpu_spheres.json"), accel="blocks")
scene = dataclasses.replace(scene, differentiable=True)
cam = Camera.create(position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5),
                    up=(0, 0, 1), focal_length_mm=24.0, width=W, height=H)
scene = dataclasses.replace(scene, camera=cam, max_bounces=2, spp=1)
print(f"device {jax.devices()[0]}", flush=True)

target = rt.render_scene(scene, jitter_mode="center", spp_override=1)
params = extract_params(scene, keys=("albedo", "light_intensity", "vertices"))
rs = np.random.RandomState(0)
params = {k: jnp.asarray(np.asarray(v) * (1.0 + 0.05 * rs.standard_normal(
    np.asarray(v).shape).astype(np.float32))) for k, v in params.items()}

vg = jax.jit(jax.value_and_grad(
    lambda p, s: render_loss(p, scene, target + 0.0 * s,
                             jitter_mode="center", spp_override=1)))


def run(i):
    loss, grads = vg(params, jnp.float32(i))
    return (float(jax.device_get(loss))
            + float(jax.device_get(jnp.sum(grads["albedo"]))))


t0 = time.time()
chk = run(0)
print(f"warmup {time.time() - t0:.1f}s chk {chk:.4f}", flush=True)
t0 = time.time()
run(1)
print(f"steady step {1e3 * (time.time() - t0):.1f} ms", flush=True)

trace_dir = "/tmp/grad_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(3):
    run(i + 2)
jax.profiler.stop_trace()

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, flush=True)
if not paths:
    sys.exit("no xplane captured")

from xprof.convert import raw_to_tool_data

tool = sys.argv[1] if len(sys.argv) > 1 else "hlo_stats"
data, ctype = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
out = f"/tmp/grad_{tool}.out"
mode = "wb" if isinstance(data, bytes) else "w"
with open(out, mode) as f:
    f.write(data)
print(f"wrote {out} ({ctype})", flush=True)

if tool == "hlo_stats":
    # hlo_stats returns JSON-ish table data; print the top rows
    txt = data.decode() if isinstance(data, bytes) else data
    try:
        tbl = json.loads(txt)
        rows = tbl if isinstance(tbl, list) else tbl.get("data", tbl)
        print(json.dumps(rows, indent=1)[:4000])
    except Exception:
        print(txt[:4000])
