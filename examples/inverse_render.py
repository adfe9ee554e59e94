"""Inverse-rendering demo: recover material albedos from a target image.

The BASELINE.md north-star configuration the forward-only reference
lacks: render a target with known materials, perturb them, and recover
by gradient descent on the pixel loss — with checkpoint/resume.

Usage: python examples/inverse_render.py [scene.json] [--steps N]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "tests/assets/scenes/gpu_spheres.json"))
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--ckpt-dir", default="/tmp/inverse_ckpt")
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=90)
    args = ap.parse_args()

    import jax.numpy as jnp
    import optax

    import raytracinginonesemester_tpu as rt
    from raytracinginonesemester_tpu.core.camera import Camera
    from raytracinginonesemester_tpu.diff.checkpoint import (
        latest_step, load_checkpoint, save_checkpoint,
    )
    from raytracinginonesemester_tpu.diff.inverse import (
        apply_params, extract_params, make_train_step,
    )
    from raytracinginonesemester_tpu.io.image import write_png
    from raytracinginonesemester_tpu.utils.logging import MetricsLogger

    scene = rt.load_scene(args.scene, accel="none")
    config_cam = Camera.create(
        position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5), up=(0, 0, 1),
        focal_length_mm=24.0, width=args.width, height=args.height,
    )
    scene = dataclasses.replace(scene, camera=config_cam, max_bounces=2, spp=1)

    target = rt.render_scene(scene, jitter_mode="center", spp_override=1)
    write_png("inverse_target.png", np.asarray(target), mode="gpu")

    true_params = extract_params(scene, keys=("albedo",))
    rs = np.random.RandomState(0)
    params = {"albedo": jnp.asarray(np.clip(
        np.asarray(true_params["albedo"]) + rs.uniform(-0.3, 0.3,
        true_params["albedo"].shape), 0.05, 1.0), jnp.float32)}

    opt = optax.adam(0.03)
    opt_state = opt.init(params)
    step_fn = make_train_step(opt, jitter_mode="center", spp_override=1)
    logger = MetricsLogger("/tmp/inverse_metrics.jsonl")

    start = 0
    if latest_step(args.ckpt_dir) is not None:
        start, params, opt_state, _ = load_checkpoint(args.ckpt_dir)
        print(f"resumed from step {start}")

    losses = []
    for i in range(start, args.steps):
        params, opt_state, loss = step_fn(params, opt_state, scene, target)
        losses.append(float(loss))
        if i % 10 == 0:
            logger.log("inverse_step", step=i, loss=float(loss))
            save_checkpoint(args.ckpt_dir, i, params, opt_state, losses)

    final = rt.render_scene(apply_params(scene, params),
                            jitter_mode="center", spp_override=1)
    write_png("inverse_result.png", np.asarray(final), mode="gpu")
    err = float(np.abs(np.asarray(params["albedo"])
                       - np.asarray(true_params["albedo"])).mean())
    logger.log("inverse_done", final_loss=losses[-1], albedo_mae=err)
    print(f"final loss {losses[-1]:.2e}, albedo MAE {err:.4f}")
    print("wrote inverse_target.png / inverse_result.png")


if __name__ == "__main__":
    main()
