"""AOT serving export: compile-once, serve-anywhere model artifacts.

The reference has no serving path at all — inference happens inside the
training notebooks (`basic_vqa/model-eval.ipynb`). This module is the
TPU-native production story on top of the same checkpoints: a trained
model is exported with `jax.export` into a serialized-StableHLO artifact
that is loaded and served WITHOUT any model-building code, on the same
or a different host/accelerator than the one it was exported from.

Artifact = one ZIP file (no pickle — see save_artifact) holding

    {"exported": {fn_name: stablehlo_bytes},
     "params":   host-numpy param pytree (the call-time argument),
     "meta":     {model family, shapes, vocab words, version, ...}}

Design points:

- The BATCH dimension is exported SYMBOLICALLY (`jax.export.symbolic_shape`),
  so one artifact serves every batch size; XLA specializes at load time.
- Params stay ARGUMENTS rather than baked-in constants: the StableHLO
  stays small (no 500 MB weight constants shipped through the compiler —
  see NOTES.md's axon constant-shipping hazard), the tree rides next to
  the bytecode, and `--int8` re-exports reuse the identical program shape.
- Exported for platforms ("cpu", "tpu") by default: the artifact is
  CPU-verifiable in CI and TPU-servable in production. The opt-in Pallas
  kernels are forced off for export — Mosaic custom-calls are TPU-only
  and cannot live in a multi-platform module (same guard as the TP
  serving path, `lctvqa/eval.py`).
- `meta` embeds the answer/question vocab word lists when an
  `--input_dir` is given, so a server can map logits -> answer strings
  with nothing but the artifact.

Inputs are raw `uint8` NHWC images and padded int32 question ids;
ImageNet normalization happens inside the exported program so it fuses
with the VGG stem on-device.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
from typing import Any, Dict, Optional

ARTIFACT_VERSION = 1
# Serving semantics: deterministic forward (dropout off), greedy decode.
_PLATFORMS = ("cpu", "tpu")


def _serving_config(mcfg):
    """Model config with every Pallas opt-in forced off (multi-platform
    export cannot carry Mosaic custom-calls; the jnp paths are the
    parity-pinned equivalents)."""
    return dataclasses.replace(
        mcfg, use_pallas_lstm=False, pallas_seq_lstm=False,
        pallas_generate=False, pallas_mixed_op=False)


def _build_fns(family: str, mcfg, has_arch: bool):
    """The serving functions for one model family, closed over the static
    config only — params/arch arrive as the `bundle` argument."""
    import jax.numpy as jnp

    from lctvqa.data.pipeline import normalize_images
    from lctvqa.models import vqa_ef, vqa_w

    def _unpack(bundle):
        return bundle["params"], (bundle["arch"] if has_arch else None)

    if family == "w":
        def answer_logits(bundle, u8, qst):
            params, _ = _unpack(bundle)
            img = normalize_images(u8)
            return vqa_w.w_forward(params, mcfg, img, qst,
                                   deterministic=True)

        return {"answer_logits": answer_logits}

    if family == "unified":
        from lctvqa.models import unified as unified_model

        def generate_qa(bundle, u8):
            """Greedy `<start> q <sep> a <end>` stream, int32 [B, T]
            (darts_vqa's img->QA serving mode)."""
            params, arch = _unpack(bundle)
            img = normalize_images(u8)
            return unified_model.unified_generate(params, arch, mcfg, img,
                                                  deterministic=True)

        return {"generate": generate_qa}

    def answer_logits(bundle, u8, qst):
        params, arch = _unpack(bundle)
        img = normalize_images(u8)
        logits, _ = vqa_ef.ef_forward(params, arch, mcfg, img, qst,
                                      deterministic=True)
        return logits

    def generate(bundle, u8):
        """Greedy question generation + its answer: (tokens [B,T],
        ans_ids [B])."""
        params, arch = _unpack(bundle)
        img = normalize_images(u8)
        gen_qst, gen_ans = vqa_ef.ef_generate(params, arch, mcfg, img,
                                              deterministic=True)
        return gen_qst, jnp.argmax(gen_ans, axis=1)

    return {"answer_logits": answer_logits, "generate": generate}


def _read_vocab(input_dir: Optional[str]) -> Dict[str, Any]:
    if not input_dir:
        return {}
    from lctvqa.text import VocabDict
    out = {}
    for key, fname in (("qst_words", "vocab_questions.txt"),
                       ("ans_words", "vocab_answers.txt"),
                       ("unified_words", "vocab_unified.txt")):
        path = os.path.join(input_dir, fname)
        if os.path.exists(path):
            out[key] = list(VocabDict(path).word_list)
    return out


def export_state(state: Dict[str, Any], mcfg, *, int8: bool = False,
                 input_dir: Optional[str] = None,
                 platforms=_PLATFORMS) -> Dict[str, Any]:
    """Export a loaded checkpoint state dict -> artifact dict.

    `state` is an `ef_model.ckpt` ({"ef_params", "arch", ...}), a
    `w_model.ckpt` ({"w_params", ...}), or a darts/unified-family
    `vqa_model.ckpt` ({"params", ...} + arch merged from `arch_par.ckpt`)
    payload; `mcfg` the ModelConfig it was trained with (self-describing
    checkpoints carry it)."""
    import jax
    import numpy as np
    from jax import export as jexport

    if "w_params" in state:
        family, params = "w", state["w_params"]
    elif "ef_params" in state:
        family, params = "ef", state["ef_params"]
    else:
        # darts/unified family checkpoint (experiment_darts.save_model):
        # the unified model's QA-stream decoder lives under params["qa"],
        # the EF model's question encoder under params["qst"].
        params = state["params"]
        family = "unified" if "qa" in params else "ef"
    arch = None if family == "w" else state.get("arch")
    if int8:
        from lctvqa import quant
        if getattr(mcfg, "arch_type", None) == "darts" and family != "w":
            raise ValueError(
                "--int8 cannot serve the darts supernet; decode a genotype "
                "and retrain with --arch_type derived first")
        params = quant.quantize_model(params)

    mcfg = _serving_config(mcfg)
    bundle = {"params": params}
    if arch is not None:
        bundle["arch"] = arch
    bundle = jax.tree_util.tree_map(lambda x: np.asarray(x), bundle)

    (b,) = jexport.symbolic_shape("b")
    img_spec = jax.ShapeDtypeStruct((b, mcfg.img_size, mcfg.img_size, 3),
                                    np.uint8)
    qst_spec = jax.ShapeDtypeStruct((b, mcfg.max_qst_len), np.int32)
    bundle_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), bundle)

    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "family": family,
        "int8": bool(int8),
        "platforms": list(platforms),
        "img_size": mcfg.img_size,
        "max_qst_len": mcfg.max_qst_len,
        "qst_vocab_size": mcfg.qst_vocab_size,
        "ans_vocab_size": mcfg.ans_vocab_size,
        "arch_type": getattr(mcfg, "arch_type", "fixed"),
        "epoch": state.get("epoch"),
    }
    from lctvqa import __version__
    meta["lctvqa_version"] = __version__
    vocab = _read_vocab(input_dir)
    # A vocab shorter than the model head silently mislabels (or, for
    # answers, IndexErrors at serve time on any argmax past the list):
    # the checkpoint and --input_dir come from different runs. Refuse —
    # BEFORE the (multi-minute) StableHLO export loop — checking only the
    # vocabs this family's serving path consumes.
    checks = (("unified_words", "qst_vocab_size"),) if family == "unified" \
        else (("qst_words", "qst_vocab_size"),
              ("ans_words", "ans_vocab_size"))
    for key, size_key in checks:
        words = vocab.get(key)
        if words is not None and len(words) != meta[size_key]:
            raise ValueError(
                f"--input_dir vocab mismatch: {key} has {len(words)} "
                f"entries but the checkpoint's {size_key} is "
                f"{meta[size_key]}; this vocab is not the one the model "
                "was trained with")
    meta.update(vocab)

    fns = _build_fns(family, mcfg, has_arch=arch is not None)
    arg_specs = {"answer_logits": (bundle_spec, img_spec, qst_spec),
                 "generate": (bundle_spec, img_spec)}
    exported = {}
    for name, fn in fns.items():
        exp = jexport.export(jax.jit(fn),
                             platforms=tuple(platforms))(*arg_specs[name])
        exported[name] = exp.serialize()
    return {"exported": exported, "params": bundle, "meta": meta}


def _tree_to_skeleton(tree, leaves: list):
    """JSON-able skeleton of a params pytree; ndarray leaves are appended
    to `leaves` and replaced by their index. Node types are tagged so the
    reconstructed pytree structure is EXACTLY the traced one (tuple vs
    list matters to the exported call)."""
    if isinstance(tree, dict):
        return {"__d__": {k: _tree_to_skeleton(v, leaves)
                          for k, v in tree.items()}}
    if isinstance(tree, list):
        return {"__l__": [_tree_to_skeleton(v, leaves) for v in tree]}
    if isinstance(tree, tuple):
        return {"__t__": [_tree_to_skeleton(v, leaves) for v in tree]}
    import numpy as np
    leaves.append(np.asarray(tree))
    return {"__leaf__": len(leaves) - 1}


def _skeleton_to_tree(skel, leaves: list):
    if "__leaf__" in skel:
        return leaves[skel["__leaf__"]]
    if "__d__" in skel:
        return {k: _skeleton_to_tree(v, leaves)
                for k, v in skel["__d__"].items()}
    if "__l__" in skel:
        return [_skeleton_to_tree(v, leaves) for v in skel["__l__"]]
    return tuple(_skeleton_to_tree(v, leaves) for v in skel["__t__"])


def _np_dtype(name: str):
    import numpy as np
    try:
        return np.dtype(name)
    except TypeError:  # bfloat16 etc. live in ml_dtypes
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


def save_artifact(artifact: Dict[str, Any], path: str) -> None:
    """Write the artifact as a ZIP of StableHLO bytes + raw param leaves
    + JSON meta/tree. No pickle anywhere (r3 verdict #8: a serving
    artifact requiring pickle.load of untrusted files is an
    arbitrary-code-execution surface). Layout:

        meta.json            artifact["meta"] (JSON)
        tree.json            {"skeleton", "leaves": [{dtype, shape}...]}
        leaves/<i>           raw little-endian bytes of param leaf i
        exported/<name>      serialized StableHLO of each function
    """
    import json
    import zipfile

    leaves: list = []
    skeleton = _tree_to_skeleton(artifact["params"], leaves)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(artifact["meta"]))
        z.writestr("tree.json", json.dumps(
            {"skeleton": skeleton,
             "leaves": [{"dtype": a.dtype.name, "shape": list(a.shape)}
                        for a in leaves]}))
        for i, a in enumerate(leaves):
            z.writestr(f"leaves/{i}", a.tobytes())
        for name, blob in artifact["exported"].items():
            z.writestr(f"exported/{name}", blob)
    os.replace(tmp, path)


def read_artifact(path: str, trusted: bool = False) -> Dict[str, Any]:
    """Read an artifact file -> artifact dict. ZIP artifacts (the current
    format) load with no code execution; legacy pickle artifacts require
    trusted=True (serve CLI: --trusted)."""
    import json
    import zipfile

    import numpy as np

    if not zipfile.is_zipfile(path):
        if not trusted:
            raise ValueError(
                f"{path} is a legacy pickle artifact; pickle.load executes "
                "arbitrary code from the file. Pass trusted=True/--trusted "
                "only for artifacts you produced yourself, or re-export")
        with open(path, "rb") as f:
            return pickle.load(f)
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        tree = json.loads(z.read("tree.json"))
        leaves = [
            np.frombuffer(z.read(f"leaves/{i}"),
                          _np_dtype(spec["dtype"])).reshape(spec["shape"])
            for i, spec in enumerate(tree["leaves"])]
        params = _skeleton_to_tree(tree["skeleton"], leaves)
        exported = {n[len("exported/"):]: z.read(n) for n in z.namelist()
                    if n.startswith("exported/")}
    return {"exported": exported, "params": params, "meta": meta}


def extract_answer_words(words) -> str:
    """Words strictly between <sep> and <end> of a decoded unified QA
    stream (darts_vqa/misc.py:107-122)."""
    ans, in_ans = [], False
    for w in words:
        if w == "<sep>":
            in_ans = True
        elif w == "<end>":
            break
        elif in_ans:
            ans.append(w)
    return " ".join(ans)


class ServingModel:
    """A loaded artifact: deserialized StableHLO + its param tree.

    Needs only jax + numpy — none of the lctvqa model code runs at
    serving time. Calls jit-cache per concrete batch shape (the exported
    module itself is batch-symbolic)."""

    def __init__(self, artifact: Dict[str, Any]):
        import jax
        from jax import export as jexport

        self.meta = artifact["meta"]
        # Transfer the param tree to the device ONCE at load. The zip
        # reader returns host numpy leaves; passing those to the jitted
        # call would re-upload the full bundle (hundreds of MB at real
        # dims) on EVERY request — measured on the chip as ~30 s/batch vs
        # 2.9 ms for the native path (NOTES.md round-4).
        self._params = jax.device_put(artifact["params"])
        self._fns = {name: jax.jit(jexport.deserialize(blob).call)
                     for name, blob in artifact["exported"].items()}

    @property
    def functions(self):
        return sorted(self._fns)

    def answer_logits(self, u8_images, qst_ids):
        return self._fns["answer_logits"](self._params, u8_images, qst_ids)

    def answer_ids(self, u8_images, qst_ids):
        import jax.numpy as jnp
        return jnp.argmax(self.answer_logits(u8_images, qst_ids), axis=1)

    def answers(self, u8_images, qst_ids):
        """Answer strings (requires vocab embedded at export time)."""
        words = self.meta.get("ans_words")
        if not words:
            raise ValueError("artifact was exported without --input_dir; "
                             "no answer vocab embedded")
        import numpy as np
        ids = np.asarray(self.answer_ids(u8_images, qst_ids))
        return [words[i] for i in ids]

    def generate(self, u8_images):
        if "generate" not in self._fns:
            raise ValueError("W-model artifacts have no generate function")
        return self._fns["generate"](self._params, u8_images)

    def generated_answers(self, u8_images):
        """Answer strings decoded from greedy generation.

        unified family: the answer segment of the QA stream (words
        strictly between <sep> and <end>, darts_vqa/misc.py:107-122);
        ef family: the vocab word of the generated-question answer head."""
        import numpy as np
        out = self.generate(u8_images)
        if self.meta["family"] == "unified":
            words = self.meta.get("unified_words")
            if not words:
                raise ValueError("artifact was exported without --input_dir;"
                                 " no unified vocab embedded")
            return [extract_answer_words([words[int(i)] for i in row])
                    for row in np.asarray(out)]
        words = self.meta.get("ans_words")
        if not words:
            raise ValueError("artifact was exported without --input_dir; "
                             "no answer vocab embedded")
        _, ans_ids = out
        return [words[int(i)] for i in np.asarray(ans_ids)]


def load_artifact(path: str, trusted: bool = False) -> ServingModel:
    return ServingModel(read_artifact(path, trusted=trusted))


def _check_roundtrip(artifact: Dict[str, Any], mcfg) -> None:
    """Exported programs == direct model apply on random inputs (run at
    --check time on the exporting host's default backend). Float outputs
    to 2e-4; token/id outputs exactly."""
    import jax
    import numpy as np

    model = ServingModel(artifact)
    fns = _build_fns(artifact["meta"]["family"], _serving_config(mcfg),
                     has_arch="arch" in artifact["params"])
    rng = np.random.default_rng(0)
    for batch in (2, 5):  # two sizes: proves the symbolic batch dim
        u8 = rng.integers(0, 256, (batch, mcfg.img_size, mcfg.img_size, 3),
                          dtype=np.uint8)
        qst = rng.integers(0, mcfg.qst_vocab_size,
                           (batch, mcfg.max_qst_len), dtype=np.int32)
        args = {"answer_logits": (u8, qst), "generate": (u8,)}
        for name in model.functions:
            got = model._fns[name](model._params, *args[name])
            want = jax.jit(fns[name])(artifact["params"], *args[name])
            for g, w in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                g, w = np.asarray(g), np.asarray(w)
                if np.issubdtype(g.dtype, np.floating):
                    np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-4)
                else:
                    np.testing.assert_array_equal(g, w)
    print(f"check ok: {model.functions} parity at batch sizes 2 and 5")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--root_stats_dir", type=str, default="./experiment_data")
    p.add_argument("--model", type=str, default="ef",
                   choices=("ef", "w", "vqa"),
                   help="which checkpoint of the experiment to export; "
                        "'vqa' is the darts/unified families' "
                        "vqa_model.ckpt (+ arch_par.ckpt when present)")
    p.add_argument("--out", type=str, default=None,
                   help="artifact path (default <exp_dir>/<model>_serving"
                        ".lctx)")
    p.add_argument("--int8", action="store_true",
                   help="export the int8-quantized serving path "
                        "(lctvqa/quant.py)")
    p.add_argument("--input_dir", type=str, default=None,
                   help="dataset dir; embeds the vocab word lists so the "
                        "server can decode answers")
    p.add_argument("--platforms", type=str, default="cpu,tpu")
    p.add_argument("--check", action="store_true",
                   help="after exporting, reload the artifact and verify "
                        "logits parity vs the direct model")
    p.add_argument("--trusted", action="store_true",
                   help="allow loading LEGACY pickle checkpoints "
                        "(pickle.load executes code from the file; only "
                        "for checkpoints you produced yourself)")
    args = p.parse_args(argv)

    from lctvqa.train import checkpoint

    exp_dir = os.path.join(args.root_stats_dir, args.exp)
    ckpt = os.path.join(exp_dir, f"{args.model}_model.ckpt")
    state = checkpoint.load_state(ckpt, trusted=args.trusted)
    if args.model == "vqa":
        # darts/unified family: arch params ride in a sibling checkpoint
        # (experiment_darts.save_model, after darts_vqa's arch_par.pt)
        ap = os.path.join(exp_dir, "arch_par.ckpt")
        if checkpoint.exists(ap):
            state = dict(state, arch=checkpoint.load_state(
                ap, trusted=args.trusted)["arch"])
    if state.get("config") is None:
        raise SystemExit(f"{ckpt} has no embedded config (legacy artifact); "
                         "re-save with a current lctvqa")
    mcfg = state["config"].model
    artifact = export_state(
        state, mcfg, int8=args.int8, input_dir=args.input_dir,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s))
    out = args.out or os.path.join(exp_dir, f"{args.model}_serving.lctx")
    save_artifact(artifact, out)
    sizes = {k: len(v) for k, v in artifact["exported"].items()}
    print(f"exported {sorted(sizes)} -> {out} "
          f"(stablehlo bytes: {sizes}; int8={args.int8})")
    if args.check:
        _check_roundtrip(artifact, mcfg)


if __name__ == "__main__":
    main()
