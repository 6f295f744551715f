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
    return ntt_sharded_batch(x[None], mesh, axis_name)[0]


@lru_cache(maxsize=None)
def _sharded_fn(B: int, N: int, C: int, axis_name: str, mesh_key):
    """jitted shard_map four-step NTT body, cached per (batch, N, mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as Pt

    mesh = _MESHES[mesh_key]
    R = N // C
    tw = np.asarray(_twiddles_dk1(N, R, C))
    pows_R = np.asarray(ntt.powers_table(max(R.bit_length() - 1, 1), np))
    pows_C = np.asarray(ntt.powers_table(max(C.bit_length() - 1, 1), np))

    def body(local_A):                     # (1, B, R, 8) on each device
        d = jax.lax.axis_index(axis_name)

        def one(col):                                      # (R, 8)
            # 1. local inner NTT of size R
            col = ntt.ntt(col, jnp, pows=jnp.asarray(pows_R))
            # 2. twiddle by w_N^(d*k1)
            tw_d = jax.lax.dynamic_index_in_dim(
                jnp.asarray(tw), d, axis=0, keepdims=False)
            return limb.mul(col, tw_d, jnp)

        cols = jax.vmap(one)(local_A[0])                   # (B, R, 8)
        # 3. transpose across the mesh: split k1 into C blocks.
        # all_to_all(tiled=False) REMOVES the split axis (size C) and
        # inserts the source-device axis at concat_axis.
        blk = cols.reshape(B, C, R // C, limb.NLIMB)
        out = jax.lax.all_to_all(blk, axis_name, split_axis=1,
                                 concat_axis=0, tiled=False)
        # out: (C, B, R//C, 8): [src_d, b, i] = per-source block
        rows = jnp.transpose(out, (1, 2, 0, 3))            # (B, R//C, C, 8)
        # 4. local outer NTT of size C over the gathered device axis
        if C > 1:
            rows = jax.vmap(jax.vmap(
                lambda v: ntt.ntt(v, jnp, pows=jnp.asarray(pows_C))))(rows)
        return rows[None]                                  # (1, B, R//C, C, 8)

    return jax.jit(shard_map(body, mesh=mesh, in_specs=(Pt(axis_name),),
                             out_specs=Pt(axis_name)))


_MESHES: dict = {}


def _mesh_key(mesh) -> tuple:
    key = (tuple(mesh.axis_names), tuple(mesh.shape.values()),
           tuple(d.id for d in mesh.devices.flat))
    _MESHES[key] = mesh
    return key


def ntt_sharded_batch(xs, mesh, axis_name: str = "seg"):
    """Distributed forward NTT of a (B, N, 8) batch of limb arrays.

    Each transform's index space is Cooley-Tukey split across the mesh
    (four-step; one all_to_all per batch); returns natural-order
    evaluations identical to per-column ntt.ntt."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as Pt

    C = mesh.shape[axis_name]
    B, N = xs.shape[0], xs.shape[1]
    R = N // C
    assert R * C == N and (R & (R - 1)) == 0 and (C & (C - 1)) == 0

    # cyclic distribution: A[d, b, n1] = xs[b, n1*C + d]
    A = jnp.transpose(jnp.asarray(xs).reshape(B, R, C, limb.NLIMB),
                      (2, 0, 1, 3))
    A = jax.device_put(A, NamedSharding(mesh, Pt(axis_name)))
    out = _sharded_fn(B, N, C, axis_name, _mesh_key(mesh))(A)
    # out[blk, b, i, k2] = X_b[k1 + R*k2] with k1 = blk*(R//C) + i
    out = jnp.transpose(out, (1, 0, 2, 3, 4)).reshape(B, R, C, limb.NLIMB)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, limb.NLIMB)


def lde_columns_sharded(polys, blowup: int, mesh,
                        axis_name: str = "seg",
                        offset: int = ntt.DEFAULT_COSET_OFFSET):
    """Mesh-distributed coset LDE of (C, n, 8) trace polynomials.

    Scale-by-offset-powers + zero-pad happen locally; the big length-N
    forward NTT runs as the four-step mesh NTT (the prove_program call
    site the reference's CPU build has no analog for — SURVEY.md §2.5).
    Returns (C, N, 8) == ntt.coset_evaluate per column."""
    import jax.numpy as jnp

    Cc, n = polys.shape[0], polys.shape[1]
    N = n * blowup
    scale = ntt.offset_powers(n, jnp, offset)
    scaled = limb.mul(jnp.asarray(polys), scale[None], jnp)
    pad = limb.zeros((Cc, N - n), jnp)
    padded = jnp.concatenate([scaled, pad], axis=1)
    return ntt_sharded_batch(padded, mesh, axis_name)
