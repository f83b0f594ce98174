"""Runnable AOT-serving example: lower ECO-Lite to one StableHLO artifact.

Exports the inference program with weights baked in (jax.export), writes
it to disk, then reloads it IN A SUBPROCESS that never imports eco_tpu —
demonstrating the deploy story: the destination needs jax only, no model
code, no prototxt (the reference's analogue ships deploy.prototxt +
.caffemodel plus the whole Caffe runtime; see PARITY.md §2.6).

    python examples/aot_artifact.py [--segments 8] [--crop 128] [--batch 4]

Works on TPU or CPU (small defaults; use --crop 224 --segments 16 on a
chip). Add --dynamic-batch to build one shape-polymorphic artifact and
call it at two different batch sizes.
"""

import argparse
import os
import subprocess
import sys
import tempfile
import textwrap

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--dynamic-batch", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eco_tpu.convert import (
        export_serving, optimize_for_inference, save_serving_artifact,
    )
    from eco_tpu.models import get_model
    from eco_tpu.runtime import Program

    graph = get_model(
        "eco_lite_kinetics", num_segments=args.segments, batch=args.batch,
        crop_size=args.crop,
    )
    shape = graph.inputs["data"]
    prog0 = Program(graph, train=False)
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.float32
    )
    params, state = prog0.init(jax.random.PRNGKey(0), {"data": data})
    graph, params, state = optimize_for_inference(graph, params, state)
    prog = Program(graph, train=False, compute_dtype=jnp.bfloat16)

    exported = export_serving(
        prog, params, state,
        batch=shape[0], segments=shape[1], crop=shape[2],
        platforms=("tpu", "cpu"), dynamic_batch=args.dynamic_batch,
    )
    path = os.path.join(tempfile.mkdtemp(), "eco_lite.stablehlo")
    nbytes = save_serving_artifact(exported, path)
    print(f"artifact: {path} ({nbytes/1e6:.1f} MB, "
          f"platforms={exported.platforms})")

    # reference answer from the live framework
    want, _ = jax.jit(lambda p, s, d: prog.apply(p, s, {"data": d}))(
        params, state, data.astype(jnp.bfloat16))
    ref = os.path.join(os.path.dirname(path), "ref.npy")
    dpath = os.path.join(os.path.dirname(path), "data.npy")
    np.save(ref, np.asarray(want["probs"], np.float32))
    np.save(dpath, np.asarray(data, np.float32))

    # destination process: jax only, eco_tpu never imported
    child = textwrap.dedent(f"""
        import sys; sys.modules['eco_tpu'] = None  # import would explode
        import numpy as np, jax, jax.numpy as jnp
        from jax import export
        exported = export.deserialize(open({path!r}, 'rb').read())
        data = jnp.asarray(np.load({dpath!r}), jnp.bfloat16)
        out = np.asarray(exported.call(data), np.float32)
        ref = np.load({ref!r})
        print('destination-process max|diff|:', np.abs(out - ref).max())
        assert np.abs(out - ref).max() < 1e-2
        print('top-1 agreement:',
              (out.argmax(-1) == ref.argmax(-1)).mean())
    """)
    subprocess.run([sys.executable, "-c", child], check=True)

    if args.dynamic_batch:
        for b in (2, args.batch + 2):
            d = jnp.asarray(
                np.random.default_rng(b).standard_normal(
                    (b,) + tuple(shape[1:])), jnp.bfloat16)
            out = exported.call(d)
            print(f"dynamic batch b={b}: out shape {out.shape}")


if __name__ == "__main__":
    main()
