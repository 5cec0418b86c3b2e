"""Genotype resolution: preset name / search checkpoint / repr file.

Closes the reference's manual search->retrain loop (genotype printed in
the log, hand-pasted into pcdarts/genotypes.py): `--genotype` accepts a
checkpoint or a repr file directly (lctvqa/genotype.py)."""

import dataclasses

import jax
import pytest

from lctvqa.config import small_test_config
from lctvqa.genotype import (genotype_from_checkpoint, main,
                             parse_genotype_repr, resolve_genotype)
from lctvqa.models import search
from lctvqa.models.genotypes import PC_DARTS_cifar, Genotype
from lctvqa.train import checkpoint


def _arch_and_cfg():
    cfg = dataclasses.replace(
        small_test_config(),
        model=dataclasses.replace(small_test_config().model,
                                  arch_type="darts", darts_steps=4,
                                  darts_multiplier=4))
    arch = search.arch_init(jax.random.PRNGKey(7), cfg.model)
    return arch, cfg


def test_resolve_preset_name():
    assert resolve_genotype("PC_DARTS_cifar") is PC_DARTS_cifar


def test_resolve_unknown_raises():
    with pytest.raises(ValueError, match="not a preset"):
        resolve_genotype("NoSuchGenotype")


def test_decode_from_checkpoint(tmp_path):
    arch, cfg = _arch_and_cfg()
    path = str(tmp_path / "ef_model.ckpt")
    checkpoint.save_state(path, {"arch": arch, "epoch": 1}, config=cfg)
    want = search.genotype(arch, 4, 4)
    assert genotype_from_checkpoint(path) == want
    assert resolve_genotype(path) == want


def test_decode_rejects_archless_checkpoint(tmp_path):
    path = str(tmp_path / "w_model.ckpt")
    checkpoint.save_state(path, {"w_params": {"a": 1}, "epoch": 1})
    with pytest.raises(ValueError, match="no arch parameters"):
        genotype_from_checkpoint(path)


def test_repr_file_roundtrip(tmp_path):
    arch, _ = _arch_and_cfg()
    g = search.genotype(arch, 4, 4)
    f = tmp_path / "geno.txt"
    f.write_text(repr(g) + "\n")
    assert resolve_genotype(str(f)) == g
    # range(...) concats (the published-paper repr style) parse too
    g2 = parse_genotype_repr(
        "Genotype(normal=[('sep_conv_3x3', 0), ('skip_connect', 1)], "
        "normal_concat=range(2, 4), reduce=[('max_pool_3x3', 0), "
        "('none', 1)], reduce_concat=range(2, 4))")
    assert isinstance(g2, Genotype)
    assert list(g2.normal_concat) == [2, 3]


def test_cli_decode_and_retrain_config(tmp_path, capsys):
    """python -m lctvqa.genotype <ckpt> -o f  -->  --genotype f builds the
    derived-net config with steps/multiplier from the genotype."""
    arch, cfg = _arch_and_cfg()
    ckpt = str(tmp_path / "arch_par.ckpt")
    checkpoint.save_state(ckpt, {"arch": arch, "arch_opt": None},
                          config=cfg)
    out = str(tmp_path / "searched.txt")
    main([ckpt, "-o", out])
    printed = capsys.readouterr().out.strip()
    want = search.genotype(arch, 4, 4)
    assert parse_genotype_repr(printed) == want

    from lctvqa.main import build_parser, config_from_args
    args = build_parser().parse_args(
        ["--input_dir", "/tmp/x", "--tiny", "--arch_type", "derived",
         "--genotype", out, "--exp", "t"])
    built = config_from_args(args)
    assert built.model.genotype == want
    assert built.model.darts_steps == len(want.normal) // 2
    assert built.model.darts_multiplier == len(want.normal_concat)
