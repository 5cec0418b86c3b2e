"""Capacity proof: the 224px stage-3 tri-level program sharded over 8
devices (r3 verdict #7).

Context: on ONE v5e, stage-3 at 224px/batch-64 is a compile-time OOM —
19.53 G unpadded (NOTES.md round-3; the reference's own defaults pair
stage-3 with 64px inputs, `basic_vqa/main.py:33`, and SKIP_STAGE3=True,
`basic_vqa/config.py`). The footprint is ACTIVATIONS of the mixed-op
trunk's two unrolls, so the axis that buys capacity is the batch/data
axis — sharding batch 64 over 8 devices divides the activation term by
8 (~2.4 G/device). The model axis (parallel/tp.py, fc6/fc7 megatron
split) additionally shards W's classifier params+activations inside the
W-unroll — measurable but second-order at 224px.

This script compiles (never executes — real 224px dims on a CPU host)
the REAL-dims stage-3 step over a virtual 8-device mesh in both layouts:

    dp8      1-D data mesh, batch sharded, params replicated
    dp4xmp2  2-D (data x model) mesh, batch over data, W's fc6/fc7
             TP-sharded per parallel/tp.py

and prints each compile's per-device `memory_analysis()` (argument +
output + temp bytes) against the v5e 16 GiB HBM budget. Numeric
correctness of the sharded stage-3 is pinned separately at small dims:
tests/test_mesh.py::test_sharded_stage3_matches_single_device (1-D) and
tests/test_tp.py::test_stage3_tp_sharded_w_matches_single_device (2-D).

Run (CPU-only, ~tens of minutes: XLA-CPU compile of the tri-level
program at real dims is the cost):
    PYTHONPATH=/root/repo python scripts/dryrun_224px_sharded.py \
        [--batch_size 64] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

V5E_HBM_BYTES = 16 * 1024**3


def _spec_tree(tree, sharding):
    """ShapeDtypeStruct pytree with a uniform sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
        tree)


def _analyze(tag: str, lowered) -> dict:
    t0 = time.time()
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    per_dev = (ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    row = {
        "argument_gib": round(ma.argument_size_in_bytes / 1024**3, 3),
        "output_gib": round(ma.output_size_in_bytes / 1024**3, 3),
        "temp_gib": round(ma.temp_size_in_bytes / 1024**3, 3),
        "alias_gib": round(ma.alias_size_in_bytes / 1024**3, 3),
        "per_device_gib": round(per_dev / 1024**3, 3),
        "fits_v5e_16gib": bool(per_dev < V5E_HBM_BYTES),
        "compile_s": round(time.time() - t0, 1),
    }
    print(tag, json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    from lctvqa import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp

    from lctvqa.config import Config, MeshConfig, ModelConfig, TrainConfig
    from lctvqa.models import vqa_ef, vqa_w
    from lctvqa.parallel import mesh as mesh_lib
    from lctvqa.parallel import tp as tp_lib
    from lctvqa.train.steps import make_lct_steps

    n = args.devices
    assert len(jax.devices()) >= n, jax.devices()
    b = args.batch_size

    # the exact run_224px.py configuration that OOM'd single-chip
    mcfg = ModelConfig(img_size=224, qst_vocab_size=8192,
                       ans_vocab_size=1000, arch_type="darts",
                       compute_dtype="bfloat16", remat_cells=True)
    cfg = Config(model=mcfg,
                 train=TrainConfig(batch_size=b, skip_stage3=False),
                 mesh=MeshConfig(num_devices=n))
    steps = make_lct_steps(cfg, unk_idx=1)

    # abstract state: eval_shape — nothing real-dims is materialized
    ef_params, arch = jax.eval_shape(
        lambda k: vqa_ef.init_ef_model(k, mcfg), jax.random.PRNGKey(0))
    w_params = jax.eval_shape(
        lambda k: vqa_w.init_w_model(k, mcfg), jax.random.PRNGKey(1))
    arch_opt = jax.eval_shape(steps["arch_tx"].init, arch)

    def batch_spec(shard):
        return {
            "image_u8": jax.ShapeDtypeStruct((b, 224, 224, 3), jnp.uint8,
                                             sharding=shard),
            "question": jax.ShapeDtypeStruct((b, mcfg.max_qst_len),
                                             jnp.int32, sharding=shard),
            "answer_label": jax.ShapeDtypeStruct((b,), jnp.int32,
                                                 sharding=shard),
            "answer_multi_choice": jax.ShapeDtypeStruct(
                (b, 10), jnp.int32, sharding=shard),
        }

    scalar = jax.ShapeDtypeStruct((), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    results = {}

    # ---- layout 1: 1-D data mesh, batch sharded, params replicated
    mesh1 = mesh_lib.make_mesh(n)
    bs1 = mesh_lib.batch_sharding(mesh1)
    rep1 = mesh_lib.replicated(mesh1)
    lowered = steps["stage3"].lower(
        _spec_tree(arch, rep1), _spec_tree(arch_opt, rep1),
        _spec_tree(ef_params, rep1), _spec_tree(w_params, rep1),
        batch_spec(bs1), batch_spec(bs1), scalar, scalar, rng)
    results[f"stage3_224px_b{b}_dp{n}"] = _analyze(
        f"stage3_224px_b{b}_dp{n}", lowered)

    # ---- layout 2: 2-D (data x model), W fc6/fc7 TP-sharded
    mp = 2
    mesh2 = tp_lib.make_mesh_2d(n // mp, mp)
    bs2 = tp_lib.batch_sharding(mesh2)
    rep2 = tp_lib.replicated(mesh2)
    w_shardings = tp_lib.param_shardings(w_params, mesh2)
    w_spec = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        w_params, w_shardings)
    lowered2 = steps["stage3"].lower(
        _spec_tree(arch, rep2), _spec_tree(arch_opt, rep2),
        _spec_tree(ef_params, rep2), w_spec,
        batch_spec(bs2), batch_spec(bs2), scalar, scalar, rng)
    results[f"stage3_224px_b{b}_dp{n // mp}xmp{mp}"] = _analyze(
        f"stage3_224px_b{b}_dp{n // mp}xmp{mp}", lowered2)

    print(json.dumps({"dryrun_224px_sharded": results,
                      "single_chip_baseline_gib": 19.53,
                      "v5e_hbm_gib": 16.0}))


if __name__ == "__main__":
    main()
