"""Pytree <-> packed-buffer transport for dispatch-bound execution.

The darts-family pytrees have O(1000) small leaves (params + two Adam
moment trees); per-call dispatch cost on TPU grows with the NUMBER of
argument buffers (severe on tunneled/remote-dispatch setups: ~20 ms/call
at ~400 leaves, NOTES.md). Packing every same-dtype leaf into one 1D
buffer makes a step's argument list O(1) buffers; unpack/re-pack happen
INSIDE jit where they are pure layout ops that XLA fuses (the packed
buffer is also the natural donation unit).

No reference counterpart (torch passes parameters by module reference);
this is TPU-execution infrastructure.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Packer:
    """Built from an example pytree; pack/unpack preserve its structure."""

    def __init__(self, example: Any):
        leaves, self.treedef = jax.tree_util.tree_flatten(example)
        self.shapes = [np.shape(l) for l in leaves]
        self.dtypes = [jnp.asarray(l).dtype for l in leaves]
        self.sizes = [int(np.prod(s)) for s in self.shapes]
        # per-dtype segment offsets, in leaf order
        self.groups: Dict[str, list] = {}
        self.offsets = []
        for i, dt in enumerate(self.dtypes):
            key = str(dt)
            seg = self.groups.setdefault(key, [0])
            self.offsets.append((key, seg[-1]))
            seg.append(seg[-1] + self.sizes[i])

    def pack(self, tree: Any) -> Dict[str, jax.Array]:
        leaves = jax.tree_util.tree_leaves(tree)
        bufs: Dict[str, list] = {k: [] for k in self.groups}
        for leaf, dt in zip(leaves, self.dtypes):
            bufs[str(dt)].append(jnp.ravel(jnp.asarray(leaf)))
        return {k: (jnp.concatenate(v) if v else jnp.zeros((0,)))
                for k, v in bufs.items()}

    def unpack(self, packed: Dict[str, jax.Array]) -> Any:
        leaves = []
        for shape, dtype, size, (key, off) in zip(
                self.shapes, self.dtypes, self.sizes, self.offsets):
            flat = packed[key][off:off + size]  # static slice — fuses away
            leaves.append(flat.reshape(shape).astype(dtype))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


def pack_step(step_fn: Callable, arg_packers: Tuple,
              out_packers: Tuple, donate: bool = True) -> Callable:
    """Wrap `step_fn(*args) -> outs` into a jitted function over packed
    buffers: positions with a Packer in `arg_packers`/`out_packers` are
    packed dicts outside, pytrees inside. Packed args that are also packed
    outputs are donated (in-place buffer reuse on device).
    """
    def inner(*packed_args):
        args = [p.unpack(a) if p is not None else a
                for p, a in zip(arg_packers, packed_args)]
        outs = step_fn(*args)
        if not isinstance(outs, tuple):
            outs = (outs,)
        return tuple(p.pack(o) if p is not None else o
                     for p, o in zip(out_packers, outs))

    donate_argnums = ()
    if donate:
        donate_argnums = tuple(
            i for i, p in enumerate(arg_packers)
            if p is not None and p in out_packers)
    return jax.jit(inner, donate_argnums=donate_argnums)
