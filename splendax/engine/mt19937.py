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

Everything is uint32 arithmetic (wrapping), so no x64 mode is needed.  This is
the engine's `rng_mode="parity"`; the default `"fast"` mode uses threefry with
the same seeding rule and selection semantics (documented semantic parity,
different bitstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 624
_MATRIX_A = jnp.uint32(0x9908B0DF)
_UPPER = jnp.uint32(0x80000000)
_LOWER = jnp.uint32(0x7FFFFFFF)


def _u32(x):
    if isinstance(x, int):  # avoid int32 overflow on python-int literals
        x = np.uint32(x & 0xFFFFFFFF)
    return jnp.asarray(x).astype(jnp.uint32)


def _init_genrand(s):
    """mt[0]=s; mt[i] = 1812433253*(mt[i-1]^(mt[i-1]>>30)) + i."""
    mt0 = jnp.zeros(N, jnp.uint32).at[0].set(_u32(s))

    def body(i, mt):
        prev = mt[i - 1]
        val = jnp.uint32(1812433253) * (prev ^ (prev >> 30)) + i.astype(jnp.uint32)
        return mt.at[i].set(val)

    return lax.fori_loop(1, N, body, mt0)


def _init_by_array(key2, keylen):
    """CPython init_by_array for a (2,)-uint32 key of effective length 1 or 2."""
    mt = _init_genrand(jnp.uint32(19650218))

    def body1(k, carry):
        mt, i, j = carry
        prev = mt[i - 1]
        val = (mt[i] ^ ((prev ^ (prev >> 30)) * jnp.uint32(1664525))) + key2[j] + j.astype(
            jnp.uint32
        )
        mt = mt.at[i].set(val)
        i = i + 1
        j = j + 1
        wrap = i >= N
        mt = mt.at[0].set(jnp.where(wrap, mt[N - 1], mt[0]))
        i = jnp.where(wrap, 1, i)
        j = jnp.where(j >= keylen, 0, j)
        return mt, i, j

    mt, i, _ = lax.fori_loop(
        0, N, body1, (mt, jnp.int32(1), jnp.int32(0))
    )

    def body2(k, carry):
        mt, i = carry
        prev = mt[i - 1]
        val = (mt[i] ^ ((prev ^ (prev >> 30)) * jnp.uint32(1566083941))) - i.astype(jnp.uint32)
        mt = mt.at[i].set(val)
        i = i + 1
        wrap = i >= N
        mt = mt.at[0].set(jnp.where(wrap, mt[N - 1], mt[0]))
        i = jnp.where(wrap, 1, i)
        return mt, i

    mt, _ = lax.fori_loop(0, N - 1, body2, (mt, i))
    return mt.at[0].set(jnp.uint32(0x80000000))


def _twist(mt):
    def body(i, mt):
        y = (mt[i] & _UPPER) | (mt[(i + 1) % N] & _LOWER)
        v = mt[(i + 397) % N] ^ (y >> 1) ^ (_MATRIX_A * (y & 1))
        return mt.at[i].set(v)

    return lax.fori_loop(0, N, body, mt)


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
