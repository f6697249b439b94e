"""Red-black cyclic reduction of the SSOR/Eisenstat system.

For a 2-color (red-black) grid the Eisenstat-SSOR preconditioned operator
collapses algebraically: with ``Atilde = D^-1/2 A D^-1/2 = I + E + E^T``
and E strictly lower in RB ordering (black rows x red cols), E^2 = 0, so

    Ahat = (I+E)^{-1} Atilde (I+E^T)^{-1} = I - E E^T

which is IDENTITY on red rows and has NO red-black coupling — the
preconditioned system decouples into ``x_r = b_r`` and the half-size
black system ``(I - E E^T)_bb x_b = b_b`` (classical cyclic reduction /
the Schur complement of the diagonally scaled system).

This module solves the HALF system on COMPACTED black/red vectors:

  * all vectors are length n/2 — every CG vector pass halves;
  * the coupling applications ``w_r = (E^T)_rb v_b`` and
    ``(E)_br w_r`` become 7-stream shifted multiply-adds on the compact
    arrays (the x couplings pick parity-dependent compact offsets, folded
    into precomputed masked streams at build time — no gathers);
  * compaction/expansion are pure reshape+select (the pair trick along
    the fastest axis) — no gathers anywhere.

Net cost per CG iteration ~ ONE SpMV-equivalent over n/2 plus half-size
vector work, while keeping RB-SSOR's iteration count (~3x fewer than
unpreconditioned on the variable_diffusion family, BENCH_NOTES r5) — the
strongest preconditioning economics on this hardware.  TPU-native design;
no reference counterpart.

Requires an even ``side`` (the compact pair layout needs x-parity to
alternate within complete pairs) and the same unit-step symmetric DIA
contract as :class:`~.preconditioners.RedBlackICPreconditioner.from_dia`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .linear_operator import LinearOperator

__all__ = ["RBReducedSystem"]


def _grid_parity(side: int, dims: int):
    """(n,) 0/1 parity of the sum of grid coordinates (red = 0)."""
    i = np.arange(side**dims, dtype=np.int64)
    p = np.zeros_like(i)
    for k in range(dims):
        p += (i // side**k) % side
    return (p % 2).astype(np.int8)


@jax.tree_util.register_pytree_node_class
class RBReducedSystem(LinearOperator):
    """Half-size black system of the RB-scaled operator (see module doc).

    Usage::

        R = RBReducedSystem.from_dia(A, side, dims)
        bb, br = R.reduce_rhs(b)          # compact black rhs + red part
        xb = cg(R, bb, reltol=...)        # half-size CG
        x = R.expand_solution(xb, br)     # solution of A x = b
    """

    def __init__(self, shape3, s_red, s_black, sr_offsets, sr_streams,
                 sb_offsets, sb_streams, lane_red):
        self.shape3 = shape3              # static (planes, rows, side)
        self.s_red = s_red                # (n/2,) D^-1/2 at red, compact
        self.s_black = s_black            # (n/2,) D^-1/2 at black, compact
        self.sr_offsets = sr_offsets      # static: offsets of E^T streams
        self.sr_streams = sr_streams      # tuple of (n/2,) streams
        self.sb_offsets = sb_offsets      # static: offsets of E streams
        self.sb_streams = sb_streams
        self.lane_red = lane_red          # (planes, rows, side/2) bool:
        # True where the RED element of the (x-pair) sits in lane 0

    # ---------------- construction ----------------

    @classmethod
    def from_dia(cls, dia, side: int, dims: int) -> "RBReducedSystem":
        from .sparse import DIAMatrix

        if not isinstance(dia, DIAMatrix):
            raise TypeError("from_dia wraps a DIAMatrix")
        side = int(side)
        if side % 2:
            raise ValueError("RBReducedSystem requires an even side")
        n = dia.shape[0]
        if side**dims != n:
            raise ValueError(f"side^dims = {side**dims} != n = {n}")
        strides = {side**k for k in range(dims)}
        offs = [o for o in dia.offsets if o != 0]
        if 0 not in dia.offsets or {abs(o) for o in offs} - strides:
            raise ValueError(
                "DIA offsets must be {0} U {+-side^k} (unit grid steps)")
        by_off = {o: np.asarray(dia._host_diag(i))
                  for i, o in enumerate(dia.offsets)}
        center = by_off[0].astype(np.float64)
        if (center <= 0).any():
            raise ZeroDivisionError("non-positive diagonal")
        for o in offs:
            if -o not in by_off:
                raise ValueError(f"offset {o} has no symmetric partner")
            c = by_off[o]
            c_T = np.roll(by_off[-o], -o)    # A[i+o, i] laid onto row i
            if not np.allclose(np.where(c != 0, c_T, 0), c, rtol=1e-6,
                               atol=0):
                raise ValueError("DIA matrix is not symmetric")
        s = 1.0 / np.sqrt(center)

        par = _grid_parity(side, dims)
        red = par == 0
        i = np.arange(n, dtype=np.int64)
        # compact index: pairs along x; element (.., x) -> (.., x//2)
        half = i // 2
        # red-compact and black-compact flat indices coincide with `half`
        # (each x-pair holds exactly one red and one black element)
        if dims == 1:
            shape3 = (1, 1, side)
        elif dims == 2:
            shape3 = (1, side, side)
        else:
            shape3 = (side**(dims - 2), side, side)

        # scaled streams e_o[i] = a_o(i) s[i] s[i+o] (0 where masked)
        def scaled(o):
            c = by_off[o].astype(np.float64)
            sh = np.zeros_like(s)
            if o > 0:
                sh[: n - o] = s[o:]
            else:
                sh[-o:] = s[: n + o]
            return c * s * sh

        # E^T application: w_red[c(i)] = sum_o e_o[i] v_black[c(i+o)],
        # i red.  Collect per compact-offset streams numerically.
        def build(rows_mask):
            streams = {}
            for o in offs:
                e = scaled(o)
                src = rows_mask & (e != 0)
                ii = i[src]
                jj = ii + o
                d = half[jj] - half[ii]
                for dv in np.unique(d):
                    sel = d == dv
                    st = streams.setdefault(int(dv),
                                            np.zeros(n // 2, np.float64))
                    np.add.at(st, half[ii[sel]], e[ii[sel]])
            offsets = tuple(sorted(streams))
            return offsets, tuple(streams[o] for o in offsets)

        sr_off, sr_st = build(red)        # red rows gather black neighbors
        sb_off, sb_st = build(~red)       # black rows gather red neighbors

        # lane_red: for each x-pair, is the red element in lane 0?
        lane_red = red[i[::2]].reshape(shape3[0], shape3[1], side // 2)

        dt = np.asarray(dia.diags[0]).dtype
        return cls(
            shape3,
            jnp.asarray(s[red], dt), jnp.asarray(s[~red], dt),
            sr_off, tuple(jnp.asarray(x, dt) for x in sr_st),
            sb_off, tuple(jnp.asarray(x, dt) for x in sb_st),
            jnp.asarray(lane_red),
        )

    # ---------------- compact layout helpers ----------------

    @property
    def nh(self) -> int:
        p, r, side = self.shape3
        return p * r * side // 2

    @property
    def shape(self):
        return (self.nh, self.nh)

    @property
    def dtype(self):
        return self.s_red.dtype

    def split(self, v):
        """(n,) grid vector -> (red_compact, black_compact), no gathers."""
        p, r, side = self.shape3
        pair = v.reshape(p, r, side // 2, 2)
        lr = self.lane_red
        red = jnp.where(lr, pair[..., 0], pair[..., 1])
        black = jnp.where(lr, pair[..., 1], pair[..., 0])
        return red.reshape(-1), black.reshape(-1)

    def merge(self, red, black):
        """Inverse of :meth:`split`."""
        p, r, side = self.shape3
        lr = self.lane_red
        red = red.reshape(p, r, side // 2)
        black = black.reshape(p, r, side // 2)
        lane0 = jnp.where(lr, red, black)
        lane1 = jnp.where(lr, black, red)
        return jnp.stack([lane0, lane1], axis=-1).reshape(-1)

    def _shift_apply(self, offsets, streams, v):
        # v: (nh,) or (nh, k) — shifts along axis 0 (the DIA.mv idiom)
        nh = self.nh
        pad = max((abs(o) for o in offsets), default=1)
        vp = jnp.pad(v, ((pad, pad),) + ((0, 0),) * (v.ndim - 1))
        acc = jnp.zeros_like(v)
        for o, c in zip(offsets, streams):
            cc = c if v.ndim == 1 else c[:, None]
            acc = acc + cc * jax.lax.dynamic_slice_in_dim(
                vp, pad + o, nh, axis=0)
        return acc

    def to_red(self, vb):
        """w_r = (E^T)_rb v_b on compact vectors."""
        return self._shift_apply(self.sr_offsets, self.sr_streams, vb)

    def to_black(self, wr):
        """(E)_br w_r on compact vectors."""
        return self._shift_apply(self.sb_offsets, self.sb_streams, wr)

    # ---------------- the reduced operator ----------------

    def mv(self, vb):
        """(I - E E^T)_bb v_b — ~one SpMV-equivalent over n/2."""
        return vb - self.to_black(self.to_red(vb))

    def rmv(self, vb):
        return self.mv(vb)                # symmetric

    # ---------------- transforms ----------------

    def reduce_rhs(self, b):
        """b -> (compact black rhs of the reduced system, compact red
        part), i.e. the black/red components of (I+E)^{-1} D^{-1/2} b."""
        br, bb = self.split(b)
        br = self.s_red * br
        bb = self.s_black * bb
        return bb - self.to_black(br), br

    def expand_solution(self, xb, br):
        """(black solution, red rhs part) -> x with A x = b.

        xhat_r = bhat_r = br (identity red rows), then
        x = D^{-1/2} (I+E^T)^{-1} xhat."""
        xr = br - self.to_red(xb)
        return self.merge(self.s_red * xr, self.s_black * xb)

    # ---------------- explicit Schur DIA form ----------------

    def to_dia(self):
        """The reduced black system ``(I - E E^T)_bb`` as an explicit
        DIAMatrix on the compact index space (~25 diagonals: pairwise sums
        of the two 7-offset stream sets).

        Single-chip the two-pass form (:meth:`mv`) is cheaper (18 vs ~27
        half-length streams); the DIA form exists for DISTRIBUTION — it
        drops straight into ``parallel.HaloDIAOperator`` /
        ``shard_dia``, so the flagship preconditioned solve runs on a
        device mesh with the existing halo machinery and zero new
        communication code (see tests/test_parallel.py)."""
        from .sparse import DIAMatrix

        nh = self.nh
        acc = {}

        def st_host(x):
            return np.asarray(x, np.float64)

        # (E E^T)_bb[c, c+d] = sum_{o1+o2=d} sb_o1[c] * sr_o2[c + o1]
        for o1, cb in zip(self.sb_offsets, self.sb_streams):
            cbh = st_host(cb)
            for o2, cr in zip(self.sr_offsets, self.sr_streams):
                crh = st_host(cr)
                sh = np.zeros(nh)
                if o1 >= 0:
                    sh[: nh - o1] = crh[o1:]
                else:
                    sh[-o1:] = crh[: nh + o1]
                d = int(o1 + o2)
                acc[d] = acc.get(d, np.zeros(nh)) + cbh * sh
        offsets = sorted(acc)
        dt = np.dtype(self.dtype)
        data = []
        rows = np.arange(nh)
        for d in offsets:
            v = -acc[d]
            if d == 0:
                v = v + 1.0
            # structural zeros where the column falls off the matrix — the
            # halo operators rely on this to make wrap-around reads inert
            v = np.where((rows + d >= 0) & (rows + d < nh), v, 0.0)
            data.append(v.astype(dt))
        return DIAMatrix(tuple(data), tuple(offsets), (nh, nh))

    # ---------------- pytree ----------------

    def tree_flatten(self):
        leaves = (self.s_red, self.s_black, self.sr_streams,
                  self.sb_streams, self.lane_red)
        aux = (self.shape3, self.sr_offsets, self.sb_offsets)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape3, sr_off, sb_off = aux
        s_red, s_black, sr_st, sb_st, lane_red = leaves
        return cls(shape3, s_red, s_black, sr_off, sr_st, sb_off, sb_st,
                   lane_red)
