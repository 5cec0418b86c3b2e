"""Pickle-free training checkpoints (round-4 verdict #7): the same
no-code-execution contract the r4 serving artifacts adopted, applied to
`--resume`. Zip of raw leaves + JSON skeleton; optax namedtuple states
and the frozen Config dataclasses reconstruct through a module
whitelist; legacy pickle loads only with trusted=True."""

import pickle
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from lctvqa.config import Config, small_test_config
from lctvqa.models.genotypes import PC_DARTS_cifar
from lctvqa.train import checkpoint


def _train_state(tiny_cfg):
    """A realistic state: params with bfloat16, a REAL optax adam chain
    state (namedtuples + EmptyState + count scalars), epoch, rng key."""
    params = {"w": jnp.ones((4, 3), jnp.bfloat16),
              "b": jnp.zeros((3,), jnp.float32),
              "nested": {"emb": jnp.arange(6, dtype=jnp.float32
                                           ).reshape(2, 3)}}
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(1e-3))
    opt = tx.init(params)
    return {"params": params, "opt": opt, "epoch": 3,
            "rng": jax.random.PRNGKey(0),
            "stats": [0.5, 0.25, 0.125]}, tx


def test_checkpoint_is_pickle_free_zip_and_roundtrips(tmp_path, tiny_cfg):
    state, tx = _train_state(tiny_cfg)
    cfg = tiny_cfg
    path = str(tmp_path / "model.ckpt")
    checkpoint.save_state(path, state, config=cfg)
    assert zipfile.is_zipfile(path)  # NOT a pickle stream

    back = checkpoint.load_state(path)  # no trusted= needed
    # params: exact dtypes (incl. bfloat16) + values
    assert (jax.tree_util.tree_structure(back["params"])
            == jax.tree_util.tree_structure(state["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(back["params"])):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state: the optax NAMEDTUPLE classes must be restored
    # (tx.update accesses fields by attribute), so the restored state is
    # directly usable by the optimizer:
    assert (jax.tree_util.tree_structure(back["opt"])
            == jax.tree_util.tree_structure(state["opt"]))
    g = jax.tree_util.tree_map(jnp.ones_like, state["params"])
    updates, _ = tx.update(g, back["opt"], back["params"])
    for leaf in jax.tree_util.tree_leaves(updates):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # scalars / lists / config dataclass
    assert back["epoch"] == 3
    assert back["stats"] == [0.5, 0.25, 0.125]
    assert isinstance(back["config"], Config)
    assert back["config"] == cfg
    assert checkpoint.load_config(path) == cfg


def test_checkpoint_roundtrips_genotype_in_config(tmp_path, tiny_cfg):
    import dataclasses
    cfg = dataclasses.replace(
        tiny_cfg,
        model=dataclasses.replace(tiny_cfg.model, arch_type="derived",
                                  genotype=PC_DARTS_cifar))
    path = str(tmp_path / "dv.ckpt")
    checkpoint.save_state(path, {"params": {"x": jnp.ones(2)}}, config=cfg)
    back = checkpoint.load_config(path)
    geno = back.model.genotype
    # Genotype is a NamedTuple of (op, idx) pairs; class restored through
    # the lctvqa whitelist, inner pairs as tuples
    assert type(geno).__name__ == "Genotype"
    assert list(geno.normal) == [tuple(x) for x in PC_DARTS_cifar.normal]
    assert list(geno.normal_concat) == list(PC_DARTS_cifar.normal_concat)


def test_legacy_pickle_checkpoint_gated_behind_trusted(tmp_path):
    path = str(tmp_path / "legacy.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"params": {"x": np.ones(2)}, "epoch": 1}, f)
    with pytest.raises(ValueError, match="legacy pickle"):
        checkpoint.load_state(path)
    back = checkpoint.load_state(path, trusted=True)
    assert back["epoch"] == 1


def test_off_whitelist_class_not_imported(tmp_path):
    """A skeleton naming a module outside optax/lctvqa/jax must NOT be
    imported; the node degrades to a plain tuple of its values."""
    import json
    state = {"x": jnp.ones(2)}
    path = str(tmp_path / "evil.ckpt")
    checkpoint.save_state(path, state)
    # rewrite the skeleton to claim a namedtuple from an arbitrary module
    with zipfile.ZipFile(path) as z:
        tree = json.loads(z.read("tree.json"))
        leaves = {n: z.read(n) for n in z.namelist() if n != "tree.json"}
    tree["skeleton"] = {"nt": {"mod": "os.path", "name": "join",
                               "v": [tree["skeleton"]]}}
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("tree.json", json.dumps(tree))
        for n, b in leaves.items():
            z.writestr(n, b)
    back = checkpoint.load_state(path)
    assert isinstance(back, tuple) and isinstance(back[0], dict)
