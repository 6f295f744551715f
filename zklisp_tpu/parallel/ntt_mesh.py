"""Multi-chip distributed NTT over a device mesh (four-step algorithm).

The LDE of very large traces (BASELINE.json's 1M+-row configs) exceeds a
single chip's budget; this module shards a length-N NTT over a 1-D mesh
with the Cooley-Tukey split N = R x C (C = number of devices):

  n = n1*C + d,  k = k1 + R*k2:
  X[k1 + R*k2] = sum_d [ w_N^(d*k1) * (sum_n1 x[n1*C + d] * w_R^(n1*k1)) ]
                 * w_C^(d*k2)

  1. device d holds the cyclic slice x[d::C] — its length-R inner NTT is
     chip-local
  2. twiddle scaling by w_N^(d*k1) (chip-local)
  3. all_to_all transpose so each device gathers one k1-block across all
     devices (the ICI exchange; the reference has no distribution at all
     — SURVEY.md §2.5 maps NTT butterfly exchange onto this axis)
  4. length-C NTT over the device axis, now chip-local

`ntt_sharded` accepts a host/replicated (N, 8) limb array, performs the
cyclic distribution, and returns natural-order evaluations identical to
the single-chip ntt.ntt.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..field import f128, limb, ntt

P = f128.P


@lru_cache(maxsize=None)
def _twiddles_dk1(N: int, R: int, C: int):
    """w_N^(d*k1) table of shape (C, R, 8) (host limb array)."""
    w = f128.get_root_of_unity(N)
    rows = []
    for d in range(C):
        wd = pow(w, d, P)
        cur = 1
        row = []
        for _ in range(R):
            row.append(cur)
            cur = f128.mul(cur, wd)
        rows.append(row)
    return limb.from_ints(rows)


def ntt_sharded(x, mesh, axis_name: str = "seg"):
    """Distributed forward NTT of a (N, 8) limb array; returns natural-
    order evaluations (== ntt.ntt(x))."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as Pt

    C = mesh.shape[axis_name]
    N = x.shape[0]
    R = N // C
    assert R * C == N and (R & (R - 1)) == 0 and (C & (C - 1)) == 0

    tw = np.asarray(_twiddles_dk1(N, R, C))
    pows_R = np.asarray(ntt.powers_table(max(R.bit_length() - 1, 1), np))
    pows_C = np.asarray(ntt.powers_table(max(C.bit_length() - 1, 1), np))

    # cyclic distribution: A[d, n1] = x[n1*C + d]
    A = jnp.transpose(jnp.asarray(x).reshape(R, C, limb.NLIMB), (1, 0, 2))

    def body(local_A):
        d = jax.lax.axis_index(axis_name)
        col = local_A[0]                                   # (R, 8)
        # 1. local inner NTT of size R
        col = ntt.ntt(col, jnp, pows=jnp.asarray(pows_R))
        # 2. twiddle by w_N^(d*k1)
        tw_d = jax.lax.dynamic_index_in_dim(jnp.asarray(tw), d, axis=0,
                                            keepdims=False)
        col = limb.mul(col, tw_d, jnp)
        # 3. transpose across the mesh: split k1 into C blocks
        blk = col.reshape(C, R // C, limb.NLIMB)
        out = jax.lax.all_to_all(blk[None], axis_name, split_axis=1,
                                 concat_axis=0, tiled=False)
        # out: (C, 1, R//C, 8): entry [src_d, 0, i] = B[src_d][my_blk*R//C+i]
        rows = jnp.transpose(out[:, 0], (1, 0, 2))         # (R//C, C, 8)
        # 4. local outer NTT of size C over the gathered device axis
        if C > 1:
            rows = jax.vmap(
                lambda v: ntt.ntt(v, jnp, pows=jnp.asarray(pows_C)))(rows)
        return rows[None]                                  # (1, R//C, C, 8)

    from jax.sharding import NamedSharding
    A = jax.device_put(A, NamedSharding(mesh, Pt(axis_name)))
    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(Pt(axis_name),),
                          out_specs=Pt(axis_name)))
    out = f(A)                       # (C, R//C, C, 8): [blk, i, k2]
    # out[blk, i, k2] = X[k1 + R*k2] with k1 = blk*(R//C) + i
    out = out.reshape(R, C, limb.NLIMB)        # [k1, k2]
    return jnp.transpose(out, (1, 0, 2)).reshape(N, limb.NLIMB)
