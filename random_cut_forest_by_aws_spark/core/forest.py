"""Random Cut Forest as flat NumPy arrays — the engine's drift sketch.

A from-scratch, vectorized re-implementation of the reference's forest
semantics (aws/random-cut-forest-by-aws), designed to live inside an Arrow
``applyInPandas`` UDF: all tree state is a handful of flat arrays with a
leading tree axis (mirroring the reference's own columnar NodeStore design,
``Java/core/.../tree/AbstractNodeStore.java:27-39``), scoring is fully
vectorized across (queries × trees), and updates loop only over *accepted*
reservoir events (O(k·log n) per tree), never over raw rows.

Semantics re-expressed from the reference (file:line cites into
/root/reference/Java/core/src/main/java/com/amazon/randomcutforest/):

* sampler weight  ``-(seq·λ) + log(-log(u))``, accept-until-full then
  replace-max — ``sampler/AbstractStreamSampler.java:147-155``,
  ``sampler/CompactSampler.java:143-159`` (initial accept fraction default
  1.0, ``RandomCutForest.java:DEFAULT_INITIAL_ACCEPT_FRACTION``);
* insert: bottom-up walk from the leaf proposing a random cut on
  box∪point per level, split at the deepest separating cut; duplicates
  increase leaf mass — ``tree/RandomCutTree.java:251-348`` (randomCut
  ``:153-240``);
* delete: decrement mass / splice leaf+parent, shrink ancestor boxes —
  ``tree/RandomCutTree.java:403-458``;
* scoring: leaf ``damp(m,M)·1/(depth+log2(m+1))`` if equal else
  ``1/(depth+1)``; up-walk mixes ``p·1/(depth+1) + (1−p)·score`` with
  p = Δrange/range(box∪x); normalized by ``log2(treeMass+1)``; forest =
  mean over trees — ``anomalydetection/AbstractScalarScoreVisitor.java:
  149-268``, ``CommonUtils.java:148-181``;
* attribution: directional Δrange split of the same recursion; high+low
  sums to the scalar score exactly — ``anomalydetection/
  AbstractAttributionVisitor.java:115-199`` (duplicate-leaf counterfactual
  shadow boxes are simplified to an equal split here; the sum invariant is
  preserved).

Determinism: sampler draws are counter-based (splitmix64 of
(seed, tree, seq)) so accept decisions are independent of batch/chunk
boundaries; cut draws come from one PCG64 stream per tree, consumed only
by accepted inserts — results are therefore invariant to how a partition's
rows are chunked (tested), which is the engine's analogue of the
reference's sequential==parallel consistency tests
(``parkservices/ConsistencyTest.java:41-278``).
"""

from __future__ import annotations

import numpy as np

_NULL = -1

# splitmix64 constants
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + _SM_GAMMA).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def _u01(key: np.uint64, seqs: np.ndarray) -> np.ndarray:
    """Counter-based Uniform(0,1) per sequence index (never exactly 0/1)."""
    h = _splitmix64(seqs.astype(np.uint64) ^ np.uint64(key))
    u = (h >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    return np.clip(u, 1e-300, 1.0 - 1e-16)


class RCFForest:
    """Random Cut Forest over float32 points, flat-array state.

    Defaults mirror the reference (``RandomCutForest.java:95-117``):
    50 trees × 256 samples, timeDecay = 1/(10·256), outputAfter =
    ⌈0.25·256⌉.
    """

    def __init__(
        self,
        dimensions: int,
        num_trees: int = 50,
        sample_size: int = 256,
        time_decay: float | None = None,
        seed: int = 42,
        output_after: int | None = None,
        initial_accept_fraction: float = 1.0,
    ):
        assert dimensions >= 1 and num_trees >= 1 and sample_size >= 2
        self.d = dimensions
        self.T = num_trees
        self.K = sample_size
        self.lam = 1.0 / (10.0 * sample_size) if time_decay is None else float(time_decay)
        self.seed = seed
        self.output_after = (
            max(1, int(np.ceil(0.25 * sample_size))) if output_after is None else output_after
        )
        self.initial_accept_fraction = initial_accept_fraction
        self.entries = 0  # total points offered
        self.seq0 = None  # first sequence index seen (weight rebase)

        T, K, d = num_trees, sample_size, dimensions
        N = 2 * K  # K leaves + (K-1) internal + spare
        self.N = N
        self.parent = np.full((T, N), _NULL, np.int32)
        self.left = np.full((T, N), _NULL, np.int32)
        self.right = np.full((T, N), _NULL, np.int32)
        self.cutdim = np.full((T, N), _NULL, np.int32)  # -1 ⇒ leaf
        self.cutval = np.zeros((T, N), np.float32)
        self.mass = np.zeros((T, N), np.int32)
        self.bbmin = np.zeros((T, N, d), np.float32)
        self.bbmax = np.zeros((T, N, d), np.float32)
        self.root = np.full(T, _NULL, np.int32)
        # free node slots, LIFO per tree
        self.freelist = np.tile(np.arange(N - 1, -1, -1, dtype=np.int32), (T, 1))
        self.freetop = np.full(T, N, np.int32)
        # sampler (replace-max reservoir; argmax instead of heap at K=256)
        self.sweight = np.full((T, K), -np.inf, np.float64)
        self.sleaf = np.full((T, K), _NULL, np.int32)
        self.sseq = np.zeros((T, K), np.int64)
        self.ssize = np.zeros(T, np.int32)
        # RNG: one PCG64 stream per tree for cut factors
        self._rngs = [
            np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, t])))
            for t in range(T)
        ]
        # distinct counter keys for sampler u and initial-accept u
        mask = (1 << 64) - 1
        self._wkeys = [
            int(_splitmix64(np.array([(seed * 2654435761 + 7919 * t + 1) & mask], np.uint64))[0])
            for t in range(T)
        ]
        self._ikeys = [
            int(_splitmix64(np.array([(seed * 40503 + 104729 * t + 2) & mask], np.uint64))[0])
            for t in range(T)
        ]

    # ------------------------------------------------------------------ #
    # node management
    # ------------------------------------------------------------------ #
    def _alloc(self, t: int) -> int:
        self.freetop[t] -= 1
        return int(self.freelist[t, self.freetop[t]])

    def _free(self, t: int, n: int) -> None:
        self.freelist[t, self.freetop[t]] = n
        self.freetop[t] += 1
        self.cutdim[t, n] = _NULL
        self.parent[t, n] = _NULL
        self.left[t, n] = _NULL
        self.right[t, n] = _NULL
        self.mass[t, n] = 0

    def _new_leaf(self, t: int, x: np.ndarray) -> int:
        n = self._alloc(t)
        self.cutdim[t, n] = _NULL
        self.mass[t, n] = 1
        self.bbmin[t, n] = x
        self.bbmax[t, n] = x
        self.left[t, n] = _NULL
        self.right[t, n] = _NULL
        self.parent[t, n] = _NULL
        return n

    # ------------------------------------------------------------------ #
    # insert / delete (reference tree/RandomCutTree.java:251-458 semantics)
    # ------------------------------------------------------------------ #
    def _insert(self, t: int, x: np.ndarray) -> int:
        """Insert float32 point into tree t, return its leaf node id."""
        if self.root[t] == _NULL:
            leaf = self._new_leaf(t, x)
            self.root[t] = leaf
            return leaf

        cutdim, cutval = self.cutdim[t], self.cutval[t]
        left, right, parent = self.left[t], self.right[t], self.parent[t]
        bbmin, bbmax, mass = self.bbmin[t], self.bbmax[t], self.mass[t]

        # descend to leaf, recording (node, sibling) from root down
        node = int(self.root[t])
        stack: list[tuple[int, int]] = [(node, _NULL)]
        while cutdim[node] >= 0:
            if x[cutdim[node]] <= cutval[node]:
                nxt, sib = int(left[node]), int(right[node])
            else:
                nxt, sib = int(right[node]), int(left[node])
            stack.append((nxt, sib))
            node = nxt
        leaf = node
        leafpt = bbmin[leaf]

        if np.array_equal(x, leafpt):  # duplicate ⇒ leaf mass bump
            mass[leaf] += 1
            for i in range(len(stack) - 2, -1, -1):
                mass[stack[i][0]] += 1
            return leaf

        # bottom-up walk: propose a cut on box∪x at each level, keep the
        # deepest separating one (tree/RandomCutTree.java:283-327)
        rng = self._rngs[t]
        box_min = leafpt.copy()
        box_max = leafpt.copy()
        idx = len(stack) - 1  # stack index of current node
        cur, sibling = leaf, stack[idx][1]
        par = int(stack[idx - 1][0]) if idx >= 1 else _NULL
        saved_node = leaf
        saved_parent = par
        saved_dim, saved_val = _NULL, np.float32(0)
        saved_box = (box_min.copy(), box_max.copy())
        while True:
            factor = rng.random()
            dim, value = self._random_cut(factor, x, box_min, box_max)
            separation = (x[dim] <= value < box_min[dim]) or (
                x[dim] > value >= box_max[dim]
            )
            if separation:
                saved_dim, saved_val = dim, value
                saved_node, saved_parent = cur, par
                saved_box = (box_min.copy(), box_max.copy())
            inside = bool(np.all(box_min <= x) and np.all(x <= box_max))
            if inside or par == _NULL:
                break
            # grow to the parent's subtree box by merging the sibling box
            np.minimum(box_min, bbmin[sibling], out=box_min)
            np.maximum(box_max, bbmax[sibling], out=box_max)
            idx -= 1
            cur, sibling = int(stack[idx][0]), stack[idx][1]
            par = int(stack[idx - 1][0]) if idx >= 1 else _NULL

        # split: new internal node replaces saved_node
        new_leaf = self._new_leaf(t, x)
        m = self._alloc(t)
        if x[saved_dim] <= saved_val:
            left[m], right[m] = new_leaf, saved_node
        else:
            left[m], right[m] = saved_node, new_leaf
        cutdim[m], cutval[m] = saved_dim, saved_val
        mass[m] = mass[saved_node] + 1
        bbmin[m] = np.minimum(saved_box[0], x)
        bbmax[m] = np.maximum(saved_box[1], x)
        parent[new_leaf] = m
        parent[saved_node] = m
        parent[m] = saved_parent
        if saved_parent == _NULL:
            self.root[t] = m
        elif left[saved_parent] == saved_node:
            left[saved_parent] = m
        else:
            right[saved_parent] = m
        # ancestors: +1 mass, grow boxes to include x
        a = saved_parent
        while a != _NULL:
            mass[a] += 1
            np.minimum(bbmin[a], x, out=bbmin[a])
            np.maximum(bbmax[a], x, out=bbmax[a])
            a = int(parent[a])
        return new_leaf

    def _random_cut(
        self, factor: float, x: np.ndarray, bmin: np.ndarray, bmax: np.ndarray
    ) -> tuple[int, np.float32]:
        """Pick (dim, value) ∝ per-dim range of box∪x (randomCut :153-240)."""
        umin = np.minimum(bmin, x)
        umax = np.maximum(bmax, x)
        gaps = (umax - umin).astype(np.float64)
        total = float(gaps.sum())
        bp = factor * total
        cum = np.cumsum(gaps)
        dim = int(np.searchsorted(cum, bp))
        if dim >= len(gaps) or gaps[dim] <= 0:
            # float fallback: first nonzero-gap dim, cut just below max
            nz = np.nonzero(gaps > 0)[0]
            dim = int(nz[0])
            value = np.nextafter(umax[dim], umin[dim])
            return dim, np.float32(value)
        prev = float(cum[dim - 1]) if dim > 0 else 0.0
        value = np.float32(umin[dim] + (bp - prev))
        if value >= umax[dim]:
            value = np.nextafter(umax[dim], umin[dim])
        return dim, np.float32(value)

    def _delete(self, t: int, leaf: int) -> None:
        parent, left, right = self.parent[t], self.left[t], self.right[t]
        mass, bbmin, bbmax = self.mass[t], self.bbmin[t], self.bbmax[t]
        if mass[leaf] > 1:
            a = leaf
            while a != _NULL:
                mass[a] -= 1
                a = int(parent[a])
            return
        p = int(parent[leaf])
        if p == _NULL:
            self.root[t] = _NULL
            self._free(t, leaf)
            return
        sib = int(right[p]) if int(left[p]) == leaf else int(left[p])
        g = int(parent[p])
        parent[sib] = g
        if g == _NULL:
            self.root[t] = sib
        elif int(left[g]) == p:
            left[g] = sib
        else:
            right[g] = sib
        self._free(t, leaf)
        self._free(t, p)
        a = g
        while a != _NULL:  # shrink ancestor boxes bottom-up
            mass[a] -= 1
            l, r = int(left[a]), int(right[a])
            np.minimum(bbmin[l], bbmin[r], out=bbmin[a])
            np.maximum(bbmax[l], bbmax[r], out=bbmax[a])
            a = int(parent[a])

    # ------------------------------------------------------------------ #
    # streaming update
    # ------------------------------------------------------------------ #
    def update(self, x, seq: int | None = None) -> None:
        x = np.asarray(x, np.float32).reshape(1, -1)
        self.update_batch(x, None if seq is None else np.array([seq], np.int64))

    def update_batch(self, X: np.ndarray, seqs: np.ndarray | None = None) -> None:
        """Offer a batch of points to every tree's sampler, in order."""
        X = np.ascontiguousarray(X, np.float32)
        B = X.shape[0]
        assert X.shape[1] == self.d
        if seqs is None:
            seqs = np.arange(self.entries, self.entries + B, dtype=np.int64)
        if self.seq0 is None:
            self.seq0 = int(seqs[0])
        rel = (seqs - self.seq0).astype(np.float64)
        for t in range(self.T):
            self._update_tree(t, X, seqs, rel)
        self.entries += B

    def _update_tree(self, t, X, seqs, rel) -> None:
        K = self.K
        # counter-based weights: chunk-boundary invariant
        u = _u01(self._wkeys[t], seqs)
        w = -rel * self.lam + np.log(-np.log(u))
        sw, sleaf, sseq = self.sweight[t], self.sleaf[t], self.sseq[t]
        size = int(self.ssize[t])
        i = 0
        B = len(X)
        f = self.initial_accept_fraction
        # fill phase (initial accept ramp, CompactSampler.java:143-159)
        while size < K and i < B:
            if f >= 1.0 or size < f * K:
                accept = True
            else:
                ui = float(_u01(self._ikeys[t], seqs[i : i + 1])[0])
                ramp = 1.0 - (size / K - f) / (1.0 - f)
                accept = ui < ramp or (size > 0 and w[i] < sw[:size].max())
            if accept:
                leaf = self._insert(t, X[i])
                sw[size], sleaf[size], sseq[size] = w[i], leaf, seqs[i]
                size += 1
            i += 1
        self.ssize[t] = size
        if i >= B:
            return
        # steady state: replace-max; scan candidates under the current max
        mx_slot = int(np.argmax(sw))
        mx = float(sw[mx_slot])
        cand = np.nonzero(w[i:] < mx)[0]
        for j in cand:
            jj = i + int(j)
            if w[jj] >= mx:
                continue
            self._delete(t, int(sleaf[mx_slot]))
            leaf = self._insert(t, X[jj])
            sw[mx_slot], sleaf[mx_slot], sseq[mx_slot] = w[jj], leaf, seqs[jj]
            mx_slot = int(np.argmax(sw))
            mx = float(sw[mx_slot])

    # ------------------------------------------------------------------ #
    # queries (vectorized across queries × trees)
    # ------------------------------------------------------------------ #
    @property
    def is_output_ready(self) -> bool:
        return self.entries >= self.output_after

    def _descend(self, X32: np.ndarray):
        """Vectorized root-to-leaf descent. Returns (leaf[Q,T], depth[Q,T])."""
        Q, T = X32.shape[0], self.T
        tt = np.broadcast_to(np.arange(T, dtype=np.int64)[None, :], (Q, T))
        qq = np.arange(Q, dtype=np.int64)[:, None]
        cur = np.broadcast_to(self.root.astype(np.int64), (Q, T)).copy()
        depth = np.zeros((Q, T), np.int32)
        safe = np.maximum(cur, 0)
        while True:
            cd = self.cutdim[tt, safe]
            internal = (cur >= 0) & (cd >= 0)
            if not internal.any():
                break
            cv = self.cutval[tt, safe]
            xd = X32[qq, np.maximum(cd, 0)]
            goleft = xd <= cv
            nxt = np.where(goleft, self.left[tt, safe], self.right[tt, safe])
            cur = np.where(internal, nxt, cur)
            depth += internal
            safe = np.maximum(cur, 0)
        return cur, depth

    def score(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score per query point (mean over trees)."""
        X32 = np.ascontiguousarray(np.atleast_2d(X), np.float32)
        Q, T = X32.shape[0], self.T
        if not (self.root >= 0).any():
            return np.zeros(Q)
        tt = np.broadcast_to(np.arange(T, dtype=np.int64)[None, :], (Q, T))
        leaf, depth = self._descend(X32)
        safe = np.maximum(leaf, 0)
        alive = leaf >= 0  # tree non-empty
        leafpt = self.bbmin[tt, safe]  # leaf box is the point
        eq = alive & np.all(X32[:, None, :] == leafpt, axis=-1)
        lm = self.mass[tt, safe].astype(np.float64)
        tm = np.where(
            self.root >= 0, self.mass[np.arange(T), np.maximum(self.root, 0)], 0
        ).astype(np.float64)[None, :]
        d64 = depth.astype(np.float64)
        score_seen = (1.0 - lm / (2.0 * np.maximum(tm, 1.0))) / (
            d64 + np.log2(lm + 1.0)
        )
        score = np.where(eq, score_seen, 1.0 / (d64 + 1.0))
        frozen = eq | ~alive
        cur = np.where(alive, self.parent[tt, safe], -1)
        d64 = d64 - 1.0
        Xb = X32[:, None, :].astype(np.float32)
        while True:
            act = (cur >= 0) & ~frozen
            if not act.any():
                break
            safe = np.maximum(cur, 0)
            bmn = self.bbmin[tt, safe]
            bmx = self.bbmax[tt, safe]
            dlt = (
                np.maximum(bmn - Xb, 0).sum(-1, dtype=np.float64)
                + np.maximum(Xb - bmx, 0).sum(-1, dtype=np.float64)
            )
            newr = (bmx - bmn).sum(-1, dtype=np.float64) + dlt
            with np.errstate(invalid="ignore", divide="ignore"):
                p = np.where(newr > 0, dlt / newr, 0.0)
            upd = act & (p > 0)
            inv_d = 1.0 / (np.maximum(d64, 0.0) + 1.0)  # inactive lanes masked
            score = np.where(upd, p * inv_d + (1.0 - p) * score, score)
            frozen |= act & (p <= 0)
            cur = np.where(act, self.parent[tt, safe], cur)
            d64 -= 1.0
        score = score * np.log2(tm + 1.0)
        return score.sum(1) / T

    def attribution(self, X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """DiVector (high[Q,d], low[Q,d]); high+low sums to score(X)."""
        X32 = np.ascontiguousarray(np.atleast_2d(X), np.float32)
        Q, T, d = X32.shape[0], self.T, self.d
        if not (self.root >= 0).any():
            return np.zeros((Q, d)), np.zeros((Q, d))
        tt = np.broadcast_to(np.arange(T, dtype=np.int64)[None, :], (Q, T))
        leaf, depth = self._descend(X32)
        safe = np.maximum(leaf, 0)
        alive = leaf >= 0
        leafpt = self.bbmin[tt, safe]
        Xb = X32[:, None, :]
        dh = np.maximum(Xb - leafpt, 0).astype(np.float64)
        dl = np.maximum(leafpt - Xb, 0).astype(np.float64)
        sumnew = (dh + dl).sum(-1)
        eq = alive & (sumnew <= 0)
        lm = self.mass[tt, safe].astype(np.float64)
        tm = np.where(
            self.root >= 0, self.mass[np.arange(T), np.maximum(self.root, 0)], 0
        ).astype(np.float64)[None, :]
        d64 = depth.astype(np.float64)
        seen = (1.0 - lm / (2.0 * np.maximum(tm, 1.0))) / (d64 + np.log2(lm + 1.0))
        unseen = 1.0 / (d64 + 1.0)
        saved = np.where(eq, seen, unseen)
        with np.errstate(invalid="ignore", divide="ignore"):
            high = np.where(
                eq[..., None], saved[..., None] / (2 * d), saved[..., None] * dh / sumnew[..., None]
            )
            low = np.where(
                eq[..., None], saved[..., None] / (2 * d), saved[..., None] * dl / sumnew[..., None]
            )
        high = np.where(alive[..., None], high, 0.0)
        low = np.where(alive[..., None], low, 0.0)
        frozen = eq | ~alive
        cur = np.where(alive, self.parent[tt, safe], -1)
        d64 = d64 - 1.0
        while True:
            act = (cur >= 0) & ~frozen
            if not act.any():
                break
            safe = np.maximum(cur, 0)
            bmn = self.bbmin[tt, safe]
            bmx = self.bbmax[tt, safe]
            dh = np.maximum(Xb - bmx, 0).astype(np.float64)
            dl = np.maximum(bmn - Xb, 0).astype(np.float64)
            dlt = (dh + dl).sum(-1)
            newr = (bmx - bmn).sum(-1, dtype=np.float64) + dlt
            with np.errstate(invalid="ignore", divide="ignore"):
                p = np.where(newr > 0, dlt / newr, 0.0)
            upd = act & (p > 0)
            ns = 1.0 / (np.maximum(d64, 0.0) + 1.0)  # inactive lanes masked
            with np.errstate(invalid="ignore", divide="ignore"):
                nh = (dh / newr[..., None]) * ns[..., None] + (1 - p)[..., None] * high
                nl = (dl / newr[..., None]) * ns[..., None] + (1 - p)[..., None] * low
            high = np.where(upd[..., None], nh, high)
            low = np.where(upd[..., None], nl, low)
            frozen |= act & (p <= 0)
            cur = np.where(act, self.parent[tt, safe], cur)
            d64 -= 1.0
        norm = np.log2(tm + 1.0)[..., None]
        return (high * norm).sum(1) / T, (low * norm).sum(1) / T

    # ------------------------------------------------------------------ #
    # checkpoint (state/RandomCutForestMapper.java analogue)
    # ------------------------------------------------------------------ #
    _ARRAY_FIELDS = (
        "parent left right cutdim cutval mass bbmin bbmax root freelist "
        "freetop sweight sleaf sseq ssize"
    ).split()

    def to_state(self) -> dict:
        state = {f: getattr(self, f).copy() for f in self._ARRAY_FIELDS}
        rng_states = []
        for g in self._rngs:
            s = g.bit_generator.state["state"]
            rng_states.append((s["state"], s["inc"]))
        state["rng_state"] = np.array(rng_states, dtype=object)
        state["meta"] = np.array(
            [self.d, self.T, self.K, self.entries, self.seed, self.output_after],
            dtype=np.int64,
        )
        state["meta_f"] = np.array(
            [self.lam, self.initial_accept_fraction, -1 if self.seq0 is None else self.seq0],
            dtype=np.float64,
        )
        return state

    @classmethod
    def from_state(cls, state: dict) -> "RCFForest":
        d, T, K, entries, seed, output_after = (int(v) for v in state["meta"])
        lam, iaf, seq0 = (float(v) for v in state["meta_f"])
        f = cls(
            d,
            num_trees=T,
            sample_size=K,
            time_decay=lam,
            seed=seed,
            output_after=output_after,
            initial_accept_fraction=iaf,
        )
        f.entries = entries
        f.seq0 = None if seq0 < 0 else int(seq0)
        for name in cls._ARRAY_FIELDS:
            getattr(f, name)[...] = state[name]
        for g, (s, inc) in zip(f._rngs, state["rng_state"]):
            st = g.bit_generator.state
            st["state"]["state"] = int(s)
            st["state"]["inc"] = int(inc)
            g.bit_generator.state = st
        return f
