"""Inverse rendering: recover scene parameters by gradient descent.

The headline capability the Rust reference cannot offer (its renderer is not
differentiable — SURVEY.md §7 stage 5/8): render a target image, perturb the
scene, and optimize the perturbed scene's continuous parameters (sphere
positions, material colors, light) until the render matches the target.

Demonstrates the full TPU training loop: jitted fwd+bwd (fused Pallas
kernels auto-on when running on TPU — forward and the site-reparameterized
backward), optax optimizer over the scene pytree, and checkpoint/resume
(ray_rust_tpu/checkpoint.py).

Run (small/CPU):  python examples/inverse_rendering.py --steps 60 --size 64
Run (TPU):        python examples/inverse_rendering.py --size 320
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import ray_rust_tpu as rt
from ray_rust_tpu import checkpoint
from ray_rust_tpu.parallel.train import TrainState, make_train_step
from ray_rust_tpu.renderer import render_color


def perturbed(scene: rt.Scene, shift=(30.0, -25.0, 20.0)) -> rt.Scene:
    """Move the red sphere (object 3 in the default scene, main.rs:222) and
    wash out its diffuse color — the parameters the optimizer must recover."""
    objs = scene.objects
    org = objs.org
    idx = 3
    org = type(org)(
        org.x.at[idx].add(shift[0]),
        org.y.at[idx].add(shift[1]),
        org.z.at[idx].add(shift[2]),
    )
    mats = scene.materials
    diff = mats.diffuse
    red_mat = int(np.asarray(objs.mat)[idx])
    diff = type(diff)(
        diff.r.at[red_mat].set(0.4),
        diff.g.at[red_mat].set(0.4),
        diff.b.at[red_mat].set(0.4),
    )
    return scene._replace(
        objects=objs._replace(org=org),
        materials=mats._replace(diffuse=diff),
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--size", type=int, default=160, help="image width (height = 3/4)")
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--pallas", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="force the fused Pallas kernels on/off (default: "
                        "auto — kernels for forward AND backward on TPU)")
    p.add_argument("--ckpt_dir", default=None, help="checkpoint/resume directory")
    p.add_argument("--ckpt_every", type=int, default=50)
    p.add_argument("--out", default=None, help="write before/after/target PNGs here")
    args = p.parse_args(argv)

    w = args.size
    h = w * 3 // 4
    cfg = rt.RenderConfig(
        xres=w, yres=h,
        # shallow unroll: inverse rendering needs smooth, well-conditioned
        # gradients more than deep specular chains
        max_reflections=2, refraction_unroll=1,
        use_pallas=args.pallas, pallas_bwd=args.pallas,
    )

    target_scene, _ = rt.default_scene()
    target_img = jax.jit(lambda s: render_color(s, cfg))(target_scene)
    target = jnp.stack([target_img.r, target_img.g, target_img.b], -1)

    scene0 = perturbed(target_scene)

    # Adam on the optimized parameter groups — object geometry and diffuse
    # color, the quantities the perturbation touched. Masking matters because
    # Adam's scale-free updates would otherwise walk EVERY leaf (camera pose,
    # light, Phong exponents) by ~lr per step, destroying image alignment
    # long before the sphere recovers. Gradients are heavy-tailed at
    # silhouettes, so clip by global norm first.
    def param_labels(s: rt.Scene):
        lab = jax.tree_util.tree_map(lambda _: "frozen", s)
        return lab._replace(
            objects=lab.objects._replace(
                org=type(s.objects.org)("opt", "opt", "opt"),
                radius="opt",
            ),
            materials=lab.materials._replace(
                diffuse=type(s.materials.diffuse)("opt", "opt", "opt"),
            ),
        )

    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"opt": optax.adam(args.lr), "frozen": optax.set_to_zero()},
            param_labels(scene0),
        ),
    )
    step_fn = make_train_step(cfg, opt)

    state = TrainState(scene0, opt.init(scene0))
    start = 0
    ck = checkpoint.Checkpointer(args.ckpt_dir) if args.ckpt_dir else None
    if ck:
        state, start = ck.restore_or(state)
        if start:
            print(f"resumed from step {start}")

    t0 = time.time()
    loss = None
    for step in range(start, args.steps):
        state, loss = step_fn(state, target)
        if step % 10 == 0 or step == args.steps - 1:
            err = float(jnp.abs(state.scene.objects.org.x[3]
                                - target_scene.objects.org.x[3]))
            print(f"step {step:4d}  loss {float(loss):.6f}  |dx_red| {err:.2f}",
                  flush=True)
        if ck and (step + 1) % args.ckpt_every == 0:
            ck.save(step, state)
    dt = time.time() - t0
    n = args.steps - start
    if n > 0:
        print(f"{n} steps in {dt:.1f}s ({dt / n * 1e3:.1f} ms/step)")

    if args.out:
        import os

        from ray_rust_tpu.renderer import render_u8
        from ray_rust_tpu.utils.image import save_png

        os.makedirs(args.out, exist_ok=True)
        save_png(f"{args.out}/target.png", render_u8(target_scene, cfg))
        save_png(f"{args.out}/initial.png", render_u8(scene0, cfg))
        save_png(f"{args.out}/optimized.png", render_u8(state.scene, cfg))
        print(f"wrote {args.out}/{{target,initial,optimized}}.png")

    return 0 if (loss is None or float(loss) < 1e-2) else 1


if __name__ == "__main__":
    raise SystemExit(main())
