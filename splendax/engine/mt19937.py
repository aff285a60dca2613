"""Exact CPython `random.Random` (MT19937) reimplemented with JAX ops.

The reference engine's only in-game randomness is the deterministic token
return (`splendor_gym/engine/rules.py:150-185`): a `random.Random(seed)` whose
seed is an integer hash of the state, consumed via `rng.choice(...)`.  To make
the TPU engine's trajectories **bit-identical** to the reference under the
same seeds, this module reproduces CPython's Mersenne-Twister exactly:

  * `random_seed` (Modules/_randommodule.c): abs(seed) split into 32-bit
    little-endian words -> `init_by_array`.
  * `getrandbits(k<=32)`: one tempered 32-bit word, right-shifted by 32-k.
  * `Random._randbelow_with_getrandbits(n)`: rejection sampling with
    k = n.bit_length().
  * `choice(seq)` = `seq[_randbelow(len(seq))]`.

Performance notes (this runs inside the engine step when rng_mode="parity"):
the two `init_by_array` passes are inherently sequential (each element feeds
the next) and are expressed as `lax.scan(..., unroll=16)`; the generator
twist has only range-limited dependencies and is computed as three fully
vectorized blocks (no loop at all).  Everything is uint32 arithmetic
(wrapping), so no x64 mode is needed.

This is the engine's `rng_mode="parity"`; the default `"fast"` mode uses
threefry with the same seeding rule and selection semantics (documented
semantic parity, different bitstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 624
_M = 397
# ensure_compile_time_eval: the module may be imported lazily from inside an
# active jit trace (see engine/rules.py's table block).
with jax.ensure_compile_time_eval():
    _MATRIX_A = jnp.uint32(0x9908B0DF)
    _UPPER = jnp.uint32(0x80000000)
    _LOWER = jnp.uint32(0x7FFFFFFF)
_UNROLL = 16


def _u32(x):
    if isinstance(x, int):  # avoid int32 overflow on python-int literals
        x = np.uint32(x & 0xFFFFFFFF)
    return jnp.asarray(x).astype(jnp.uint32)


def _init_genrand(s):
    """mt[0]=s; mt[i] = 1812433253*(mt[i-1]^(mt[i-1]>>30)) + i."""
    s = _u32(s)

    def f(prev, i):
        val = jnp.uint32(1812433253) * (prev ^ (prev >> 30)) + i
        return val, val

    _, vals = lax.scan(
        f, s, jnp.arange(1, N, dtype=jnp.uint32), unroll=_UNROLL
    )
    return jnp.concatenate([s[None], vals])


def _init_by_array(key2, keylen):
    """CPython init_by_array for a (2,)-uint32 key of effective length 1 or 2.

    Both passes walk i = 1..623 then wrap (mt[0] <- mt[623]; one extra
    iteration at i=1); expressed as sequential scans over precomputed
    per-position addends.
    """
    mt = _init_genrand(jnp.uint32(19650218))

    # Pass 1: k = max(N, keylen) = 624 iterations, j cycles mod keylen.
    j_seq = (jnp.arange(N, dtype=jnp.int32) % keylen).astype(jnp.uint32)
    addend = key2[j_seq] + j_seq  # key[j] + j for each iteration

    def f1(prev, x):
        mt_i, kt = x
        val = (mt_i ^ ((prev ^ (prev >> 30)) * jnp.uint32(1664525))) + kt
        return val, val

    # Iterations 0..622 write mt[1..623].
    prev, vals = lax.scan(
        f1, mt[0], (mt[1:], addend[: N - 1]), unroll=_UNROLL
    )
    mt0 = vals[-1]  # wrap: mt[0] = mt[623]
    # Iteration 623 rewrites mt[1].
    mt1, _ = f1(mt0, (vals[0], addend[N - 1]))
    mt = jnp.concatenate([mt0[None], mt1[None], vals[1:]])  # [0,1,2..623]

    # Pass 2: k = N-1 = 623 iterations, subtract i.
    def f2(prev, x):
        mt_i, i = x
        val = (mt_i ^ ((prev ^ (prev >> 30)) * jnp.uint32(1566083941))) - i
        return val, val

    # Iterations 0..621 write mt[2..623] (i = 2..623).
    i_seq = jnp.arange(2, N, dtype=jnp.uint32)
    prev, vals2 = lax.scan(f2, mt[1], (mt[2:], i_seq), unroll=_UNROLL)
    mt0 = vals2[-1]  # wrap
    mt1, _ = f2(mt0, (mt[1], jnp.uint32(1)))  # final iteration at i=1
    mt = jnp.concatenate([mt0[None], mt1[None], vals2])  # [0,1,2..623]

    return mt.at[0].set(jnp.uint32(0x80000000))


def _twist(mt):
    """Generate the next 624-word block — fully vectorized.

    new[i] = new_or_old[(i+397)%624] ^ twist(mt[i], mt[(i+1)%624]).  The
    "far" read is an OLD value for i < 227 and a fresh value at distance 227
    behind otherwise, so the block factors into dense chunks of <= 227:
      A  = i in [  0,227): far = old mt[397:624]
      B1 = i in [227,454): far = A
      B2 = i in [454,623): far = B1[:169]
      i = 623:             far = B1[169], next = A[0]
    — four vector ops instead of a 624-iteration loop.
    """

    def tw(cur, nxt, far):
        y = (cur & _UPPER) | (nxt & _LOWER)
        return far ^ (y >> 1) ^ (_MATRIX_A * (y & 1))

    K = N - _M  # 227
    A = tw(mt[:K], mt[1 : K + 1], mt[_M:])
    B1 = tw(mt[K : 2 * K], mt[K + 1 : 2 * K + 1], A)
    B2 = tw(mt[2 * K : N - 1], mt[2 * K + 1 : N], B1[: N - 1 - 2 * K])
    last = tw(mt[N - 1], A[0], B1[_M - 1 - K])
    return jnp.concatenate([A, B1, B2, last[None]])


def _temper(y):
    y = y ^ (y >> 11)
    y = y ^ ((y << 7) & jnp.uint32(0x9D2C5680))
    y = y ^ ((y << 15) & jnp.uint32(0xEFC60000))
    return y ^ (y >> 18)


def init_from_seed_words(seed_lo, seed_hi):
    """Pre-generated block of tempered outputs for `random.Random(seed)`.

    `seed = seed_hi * 2**32 + seed_lo` (both non-negative).  Returns a
    (block[624] uint32, ptr int32) stream; the engine's token return consumes
    well under 624 words, so a single block always suffices (the rejection
    loop has acceptance probability >= 5/8 per draw).
    """
    key2 = jnp.stack([_u32(seed_lo), _u32(seed_hi)])
    keylen = jnp.where(_u32(seed_hi) > 0, jnp.int32(2), jnp.int32(1))
    mt = _init_by_array(key2, keylen)
    block = _temper(_twist(mt))
    return block, jnp.int32(0)


# Number of bits for _randbelow of n in 1..5: n.bit_length().
with jax.ensure_compile_time_eval():
    _BITLEN = jnp.asarray([0, 1, 2, 2, 3, 3], dtype=jnp.int32)


def randbelow(stream, n):
    """CPython Random._randbelow_with_getrandbits for 1 <= n <= 5.

    Consumes exactly as many getrandbits(k) draws as CPython would
    (rejection sampling), keeping the stream position bit-compatible.
    """
    block, ptr = stream
    k = _BITLEN[jnp.clip(n, 0, 5)]
    shift = (jnp.int32(32) - k).astype(jnp.uint32)

    def cond(carry):
        r, ptr, first = carry
        return first | (r >= n.astype(jnp.uint32))

    def body(carry):
        _, ptr, _ = carry
        r = block[ptr] >> shift
        return r, ptr + 1, jnp.asarray(False)

    r, ptr, _ = lax.while_loop(cond, body, (jnp.uint32(0), ptr, jnp.asarray(True)))
    return (block, ptr), r.astype(jnp.int32)


def py_randbelow_reference(seed: int, ns):
    """Host-side oracle: the same draws via actual CPython random (tests)."""
    import random

    rng = random.Random(seed)
    return [rng._randbelow(n) for n in ns]
