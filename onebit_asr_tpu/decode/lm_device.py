"""Device-resident n-gram LM for shallow fusion inside the on-device beam.

The host beam search fuses `decode/lm.py`'s stupid-backoff n-gram LM by
calling `.score(context, c)` per extension (beam.py); the reference has no
LM at all (/root/reference/onebit_asr/metrics.py:74, "no LM"). To fuse the
same LM into `decode/beam_device.py` — which runs the whole search as one
`lax.scan` on the TPU with zero host round-trips — the count tables must
live on device with O(1) jit-friendly lookup.

Design: one open-addressed hash table over ALL n-gram levels at once.
Each stored entry is a seen n-gram `(t_1..t_n)` with its LOCAL score
`log(count(t_1..t_n) / count(t_1..t_{n-1}))` precomputed at pack time (the
context count always exists: `fit` counts every level at every position, so
an n-gram's (n-1)-prefix is counted at the same offset). Keys are two
independent 32-bit multiplicative hashes over `(n, t_1..t_n)` — 64 key bits
per entry, collision odds negligible against beam-score float noise (same
argument as beam_device.py's prefix dedup). Lookup probes linearly at most
`max_probes` slots (measured at pack time; load factor <= 0.5 keeps it
small and the unrolled probe loop static).

Backoff on device mirrors `NGramLM.score` exactly: try the longest usable
context `L0 = min(order-1, len(prefix))`, shorten on miss while adding
log(0.4) per level, floor at the unseen-unigram constant. Because every
level's hit/value is an independent probe, the device evaluates all levels
in parallel and selects the longest eligible hit — identical arithmetic to
the host's sequential while-loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.decode.lm import FLOOR, LOG_BACKOFF, NGramLM

_M1 = 1000003
_M2 = 2654435761
_MASK32 = 0xFFFFFFFF
_SEED1 = 2166136261
_SEED2 = 0x9E3779B9


def _fold_host(h1: int, h2: int, tok: int):
    t = (int(tok) + 1) & _MASK32
    return ((h1 * _M1) + t) & _MASK32, ((h2 * _M2) + t) & _MASK32


def _hash_host(tokens) -> tuple[int, int]:
    h1, h2 = _SEED1, _SEED2
    for t in tokens:
        h1, h2 = _fold_host(h1, h2, t)
    if h1 == 0 and h2 == 0:  # (0,0) is the empty-slot sentinel
        h1 = 1
    return h1, h2


@jax.tree_util.register_pytree_node_class
class DeviceLM:
    """Packed stupid-backoff n-gram LM (see module docstring).

    Pytree leaves: k1/k2 (uint32 keys), val (f32 local scores). Static aux:
    order and max_probes (they shape the unrolled device lookup)."""

    def __init__(self, k1, k2, val, order: int, max_probes: int):
        self.k1 = k1
        self.k2 = k2
        self.val = val
        self.order = int(order)
        self.max_probes = int(max_probes)

    def tree_flatten(self):
        return (self.k1, self.k2, self.val), (self.order, self.max_probes)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    # ----------------------------------------------------------------- pack

    @classmethod
    def pack(cls, lm: NGramLM) -> "DeviceLM":
        """Pack a host NGramLM into device tables."""
        entries = []  # (h1, h2, local_score)
        for n in range(1, lm.order + 1):
            for key, num in lm.counts[n].items():
                den = lm.total if n == 1 else lm.counts[n - 1].get(key[:-1])
                if not den:
                    continue  # unreachable for fit()-built models; safety
                h1, h2 = _hash_host((n,) + key)
                entries.append((h1, h2, float(np.log(num / den))))

        size = 64
        while size < 2 * max(len(entries), 1):
            size *= 2
        mask = size - 1
        k1 = np.zeros((size,), np.uint32)
        k2 = np.zeros((size,), np.uint32)
        val = np.zeros((size,), np.float32)
        max_probes = 1
        for h1, h2, v in entries:
            j = 0
            idx = h1 & mask
            while k1[idx] or k2[idx]:
                if int(k1[idx]) == h1 and int(k2[idx]) == h2:
                    break  # duplicate hash (identical n-gram cannot recur)
                j += 1
                idx = (idx + 1) & mask
            k1[idx], k2[idx], val[idx] = h1, h2, v
            max_probes = max(max_probes, j + 1)
        return cls(
            jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(val),
            lm.order, max_probes,
        )

    # --------------------------------------------------------------- lookup

    def _probe(self, q1: jnp.ndarray, q2: jnp.ndarray):
        """(hit bool, value f32) for query hash arrays of any shape."""
        mask = jnp.uint32(self.k1.shape[0] - 1)
        found = jnp.zeros(q1.shape, bool)
        value = jnp.zeros(q1.shape, jnp.float32)
        for j in range(self.max_probes):
            idx = (q1 + jnp.uint32(j)) & mask
            hit = (self.k1[idx] == q1) & (self.k2[idx] == q2)
            # a (0,0) query cannot occur: _fold forces h1|=1 on (0,0)
            new = hit & ~found
            value = jnp.where(new, self.val[idx], value)
            found = found | hit
        return found, value

    def scores(
        self,
        prefixes: jnp.ndarray,  # [W, L] int32 token rows (-1 pad irrelevant)
        plen: jnp.ndarray,  # [W] int32 prefix lengths
        cand: jnp.ndarray,  # [K] int32 candidate next tokens
    ) -> jnp.ndarray:
        """log P(cand | prefix) per (beam, candidate), stupid backoff —
        identical arithmetic to NGramLM.score (lm.py:64-78)."""
        W = prefixes.shape[0]
        lmax = self.order - 1
        # last lmax tokens of each prefix, left-aligned into slot i of lmax
        pos = plen[:, None] - lmax + jnp.arange(lmax)[None, :]  # [W, lmax]
        ctx = jnp.take_along_axis(
            prefixes, jnp.clip(pos, 0, prefixes.shape[1] - 1), axis=1
        )  # [W, lmax]; rows with pos<0 are unused (level > L0 ineligible)

        l0 = jnp.minimum(plen, lmax)  # [W] host: ctx = last min(o-1, len)
        # all-miss base: every tried level backs off, unigram floors
        score = l0.astype(jnp.float32)[:, None] * LOG_BACKOFF + FLOOR
        score = jnp.broadcast_to(score, (W, cand.shape[0]))
        for level in range(0, lmax + 1):  # ascending: longest hit wins last
            h1 = jnp.full((W,), _SEED1, jnp.uint32)
            h2 = jnp.full((W,), _SEED2, jnp.uint32)
            h1, h2 = _fold_dev(h1, h2, jnp.int32(level + 1))  # n tag
            for i in range(lmax - level, lmax):
                h1, h2 = _fold_dev(h1, h2, ctx[:, i])
            q1, q2 = _fold_dev(h1[:, None], h2[:, None], cand[None, :])
            q1 = jnp.where((q1 == 0) & (q2 == 0), jnp.uint32(1), q1)
            hit, value = self._probe(q1, q2)
            eligible = hit & (level <= l0)[:, None]
            cand_score = (l0[:, None] - level).astype(jnp.float32) * LOG_BACKOFF + value
            score = jnp.where(eligible, cand_score, score)
        return score


def _fold_dev(h1, h2, tok):
    t = (tok + 1).astype(jnp.uint32)
    return h1 * jnp.uint32(_M1) + t, h2 * jnp.uint32(_M2) + t
