"""On-device DIIS (Pulay) extrapolation over amplitude pytrees.

Functional counterpart of the reference's helper_diis
(/root/reference/pycc/utils.py:6-139): fixed-size ring buffers of amplitude
and residual snapshots live on device; the B-matrix build and solve are tiny
jnp.linalg ops, so the whole accelerated solver step stays inside one jit.
"""

from dataclasses import dataclass
import jax
import jax.numpy as jnp
from jax import tree_util


def _flatten(amps):
    leaves = tree_util.tree_leaves(amps)
    return jnp.concatenate([jnp.ravel(x) for x in leaves])


def _unflatten(vec, template):
    leaves, treedef = tree_util.tree_flatten(template)
    out = []
    pos = 0
    for leaf in leaves:
        n = leaf.size
        out.append(jnp.reshape(vec[pos:pos + n], leaf.shape))
        pos += n
    return tree_util.tree_unflatten(treedef, out)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DIISState:
    amps: jnp.ndarray    # (max_diis, N) ring of amplitude snapshots
    errs: jnp.ndarray    # (max_diis, N) ring of error vectors
    count: jnp.ndarray   # scalar int: number of vectors pushed so far

    def tree_flatten(self):
        return ((self.amps, self.errs, self.count), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class DIIS:
    """DIIS over an arbitrary amplitude pytree with a static ring size."""

    def __init__(self, template, max_diis=8):
        self.max_diis = max_diis
        self.template = template
        self.n = _flatten(template).size
        self.dtype = _flatten(template).dtype

    def init(self):
        z = jnp.zeros((self.max_diis, self.n), dtype=self.dtype)
        return DIISState(amps=z, errs=jnp.zeros_like(z),
                         count=jnp.zeros((), dtype=jnp.int32))

    def push(self, state, amps, prev_amps):
        """Record a new (amplitude, error) pair; error = amps - prev."""
        a = _flatten(amps)
        e = a - _flatten(prev_amps)
        slot = jnp.mod(state.count, self.max_diis)
        return DIISState(amps=state.amps.at[slot].set(a),
                         errs=state.errs.at[slot].set(e),
                         count=state.count + 1)

    def extrapolate(self, state, amps):
        """Solve the Pulay system over the filled slots; masked for ragged
        fill so the shapes stay static under jit."""
        m = self.max_diis
        nvec = jnp.minimum(state.count, m)
        valid = (jnp.arange(m) < nvec)
        E = state.errs
        B = jnp.real(E.conj() @ E.T)
        # mask invalid rows/cols to identity so the solve stays well-posed
        mask2 = valid[:, None] & valid[None, :]
        # normalize by the largest valid element for conditioning
        bmax = jnp.max(jnp.where(mask2, jnp.abs(B), 0.0))
        B = B / jnp.where(bmax > 0, bmax, 1.0)
        B = jnp.where(mask2, B, jnp.where(jnp.eye(m, dtype=bool), 1.0, 0.0))
        # bordered system
        Bb = jnp.zeros((m + 1, m + 1), dtype=B.dtype)
        Bb = Bb.at[:m, :m].set(B)
        border = jnp.where(valid, -1.0, 0.0)
        Bb = Bb.at[:m, m].set(border)
        Bb = Bb.at[m, :m].set(border)
        rhs = jnp.zeros((m + 1,), dtype=B.dtype).at[m].set(-1.0)
        c = jnp.linalg.solve(Bb, rhs)[:m]
        c = jnp.where(valid, c, 0.0)
        new = (c.astype(state.amps.dtype) @ state.amps)
        do_it = nvec >= 2
        cur = _flatten(amps)
        out = jnp.where(do_it, new, cur)
        return _unflatten(out, self.template)
