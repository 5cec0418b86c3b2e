"""Genotype resolution + decode CLI.

The reference's search->retrain workflow is manual: the searched genotype
is printed in the search log (`basic_vqa/pcdarts/model_search.py:205-250`,
logged per epoch by `basic_vqa/experiment.py:136-139`) and the user pastes
it into `pcdarts/genotypes.py` to retrain it. Here the loop is turnkey:

- ``--genotype`` (lctvqa/main.py) accepts a preset NAME (``PC_DARTS_cifar``),
  a search CHECKPOINT path (``ef_model.ckpt`` / ``arch_par.ckpt`` — the arch
  params are decoded on the spot with the steps/multiplier embedded in the
  checkpoint's own config), or a TEXT FILE containing a ``Genotype(...)``
  repr (e.g. one copied from a search log).
- ``python -m lctvqa.genotype <checkpoint> [-o genotype.txt]`` decodes and
  prints a searched genotype for inspection or later retraining.
"""

from __future__ import annotations

import argparse
import os

from lctvqa.models import genotypes
from lctvqa.models.genotypes import Genotype


def parse_genotype_repr(text: str) -> Genotype:
    """Parse a ``Genotype(...)`` repr (as printed in search logs)."""
    ns = {"Genotype": Genotype, "range": range}
    g = eval(text.strip(), {"__builtins__": {}}, ns)  # noqa: S307
    if not isinstance(g, Genotype):
        raise ValueError(f"not a Genotype repr: {text[:80]!r}")
    return g


def genotype_from_checkpoint(path: str, trusted: bool = False) -> Genotype:
    """Decode the arch params stored in a search checkpoint
    (``ef_model.ckpt`` from the LCT family or ``arch_par.ckpt`` /
    ``vqa_model.ckpt``-adjacent from the darts family)."""
    from lctvqa.models import search
    from lctvqa.train import checkpoint

    state = checkpoint.load_state(path, trusted=trusted)
    if not isinstance(state, dict) or "arch" not in state \
            or state["arch"] is None:
        raise ValueError(f"{path} holds no arch parameters (fixed-arch or "
                         "W-model checkpoint?)")
    cfg = state.get("config")
    steps = cfg.model.darts_steps if cfg is not None else 4
    multiplier = cfg.model.darts_multiplier if cfg is not None else 4
    return search.genotype(state["arch"], steps, multiplier)


def resolve_genotype(spec: str) -> Genotype:
    """``--genotype`` value -> Genotype: preset name | checkpoint path |
    text file with a Genotype repr."""
    preset = getattr(genotypes, spec, None)
    if isinstance(preset, Genotype):
        return preset
    if os.path.exists(spec):
        try:
            return genotype_from_checkpoint(spec)
        except Exception:
            with open(spec) as f:
                return parse_genotype_repr(f.read())
    names = [n for n in dir(genotypes)
             if isinstance(getattr(genotypes, n), Genotype)]
    raise ValueError(
        f"--genotype {spec!r}: not a preset ({', '.join(sorted(names))}), "
        "an existing checkpoint, or a Genotype-repr file")


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Decode the searched genotype from a checkpoint")
    p.add_argument("checkpoint",
                   help="ef_model.ckpt (LCT) or arch_par.ckpt (darts)")
    p.add_argument("-o", "--out", default="",
                   help="also write the repr to this file (usable later "
                        "via --genotype <file>)")
    p.add_argument("--trusted", action="store_true",
                   help="allow loading LEGACY pickle checkpoints "
                        "(pickle.load executes code from the file)")
    args = p.parse_args(argv)
    g = genotype_from_checkpoint(args.checkpoint, trusted=args.trusted)
    print(repr(g))
    if args.out:
        with open(args.out, "w") as f:
            f.write(repr(g) + "\n")


if __name__ == "__main__":
    main()
