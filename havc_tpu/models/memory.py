"""Fixed-shape exemplar memory bank (the lax.scan answer to XMem).

Reference-faithful rebuild of ColorMNet's memory system (reference:
vsdeoldify/colormnet/inference/memory_manager.py:8-288 ``MemoryManager``,
kv_memory_store.py (231 LoC ``KeyValueMemoryStore``),
inference_core.py:9-231 ``InferenceCore``):

* **working memory** — one insertion-ordered store that receives BOTH
  exemplar (reference-image) inserts and every-``mem_every``-frame video
  inserts (both go through ``MemoryManager.add_memory``).  The FIRST insert
  is protected forever (the consolidation candidate slice starts at ``HW``,
  memory_manager.py:225); later reference inserts age out like any frame.
* **consolidation** — when the store reaches ``max_mid_term_frames`` frames
  (checked AFTER each insert, memory_manager.py:186), every frame except
  the first insert and the ``min_mid_term_frames - 1`` most recent is a
  candidate (the ``[HW : -min_work_elements + HW]`` slice); the
  ``num_prototypes`` highest *normalized-usage* candidate tokens become
  prototype keys, whose values/shrinkage are POTENTIATED — softmax-read
  from all candidates using the prototypes' stored SELECTION as the query
  weighting (memory_manager.consolidation:246-288) — and appended to
* **long-term memory** — a token store with normalized-usage LRU eviction:
  when its size reaches ``max_long_term_elements - num_prototypes``, only
  tokens with usage STRICTLY above the k-th smallest survive
  (kv_memory_store.remove_obsolete_features:137-170).
* **usage** — per-token ``use_count / life_count``: every memory match adds
  the token's affinity mass to ``use`` and 1 to every resident token's
  ``life`` (new tokens start use=0, life=1e-7; kv_memory_store.py:36-99).

The reference grows/shrinks tensors dynamically; under XLA everything is
static-shape:

* the working store is a ring of ``max_mt_frames`` frame slots addressed by
  insertion stamp — slot 0 pinned to the protected first insert, the rest
  cycling ``1 + (stamp-1) % (W-1)`` (live non-first stamps always span
  <= W-1 consecutive values, so no live slot is ever overwritten);
* the long-term store is ``lt_capacity`` token slots with a validity mask;
  eviction masks slots, appends fill the first free slots.

Deliberate deviation (documented): for degenerate configs where the
reference's eviction would raise and silently skip consolidation forever
(max_long_term_elements < num_prototypes on short clips — the bare
``except: pass`` at memory_manager.py:192), this implementation still
consolidates, keeping the working set bounded.  Static shapes cannot grow
unboundedly, and the bounded behaviour is the intended one.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .colormnet import get_similarity, readout, topk_softmax

__all__ = ["MemoryConfig", "MemoryState", "init_memory", "insert_working",
           "read_memory"]


class MemoryConfig(NamedTuple):
    key_dim: int = 64
    value_dim: int = 512
    num_objects: int = 2
    tokens_per_frame: int = 336  # P = (H/16)*(W/16) at working resolution
    max_mt_frames: int = 10  # reference max_mid_term_frames (T_max)
    min_mt_frames: int = 5  # reference min_mid_term_frames (T_min)
    num_prototypes: int = 128  # P in the XMem paper
    lt_capacity: int = 10000  # max_long_term_elements (TOKENS, LT_max)
    top_k: int = 30  # top-k readout
    mem_every: int = 5  # r in the paper
    count_long_usage: bool = True  # enable_long_term_count_usage


class MemoryState(NamedTuple):
    # working store (frame granularity, insertion-stamped ring)
    work_keys: jnp.ndarray  # (W, P, Ck)
    work_shrink: jnp.ndarray  # (W, P)
    work_sel: jnp.ndarray  # (W, P, Ck) selection (e_proj), for potentiation
    work_values: jnp.ndarray  # (O, W, P, Cv)
    work_use: jnp.ndarray  # (W, P) f32 use_count
    work_life: jnp.ndarray  # (W, P) f32 life_count
    work_valid: jnp.ndarray  # (W,) bool
    work_stamp: jnp.ndarray  # (W,) int32 insertion stamp
    next_stamp: jnp.ndarray  # scalar int32: total inserts so far

    # long-term store (token granularity)
    lt_keys: jnp.ndarray  # (L, Ck)
    lt_shrink: jnp.ndarray  # (L,)
    lt_values: jnp.ndarray  # (O, L, Cv)
    lt_use: jnp.ndarray  # (L,) f32
    lt_life: jnp.ndarray  # (L,) f32
    lt_valid: jnp.ndarray  # (L,) bool


def init_memory(cfg: MemoryConfig, dtype=jnp.float32) -> MemoryState:
    W, P, L, O = (cfg.max_mt_frames, cfg.tokens_per_frame, cfg.lt_capacity,
                  cfg.num_objects)
    assert cfg.max_mt_frames >= 2, "need >= 2 working frame slots"
    assert cfg.max_mt_frames > cfg.min_mt_frames >= 1
    return MemoryState(
        work_keys=jnp.zeros((W, P, cfg.key_dim), dtype),
        work_shrink=jnp.ones((W, P), dtype),
        work_sel=jnp.zeros((W, P, cfg.key_dim), dtype),
        work_values=jnp.zeros((O, W, P, cfg.value_dim), dtype),
        work_use=jnp.zeros((W, P), jnp.float32),
        work_life=jnp.full((W, P), 1e-7, jnp.float32),
        work_valid=jnp.zeros((W,), bool),
        work_stamp=jnp.zeros((W,), jnp.int32),
        next_stamp=jnp.zeros((), jnp.int32),
        lt_keys=jnp.zeros((L, cfg.key_dim), dtype),
        lt_shrink=jnp.ones((L,), dtype),
        lt_values=jnp.zeros((O, L, cfg.value_dim), dtype),
        lt_use=jnp.zeros((L,), jnp.float32),
        lt_life=jnp.full((L,), 1e-7, jnp.float32),
        lt_valid=jnp.zeros((L,), bool),
    )


def _consolidate(s: MemoryState, cfg: MemoryConfig) -> MemoryState:
    """Memory compression (memory_manager.compress_features + consolidation
    + long-term eviction, static-shape form).  Runs when the working store
    holds ``max_mt_frames`` frames (post-insert check)."""
    W, P, L, O = (cfg.max_mt_frames, cfg.tokens_per_frame, cfg.lt_capacity,
                  cfg.num_objects)
    n = W * P
    k_p = min(cfg.num_prototypes, n)

    # candidates: the [HW : -min_work_elements + HW] slice in insertion
    # order == everything except the first insert (stamp 0) and the
    # (min_mt_frames - 1) most recent frames
    s_max = jnp.max(jnp.where(s.work_valid, s.work_stamp, -1))
    cand_frame = (
        s.work_valid
        & (s.work_stamp >= 1)
        & (s.work_stamp <= s_max - (cfg.min_mt_frames - 1))
    )
    cand_tok = jnp.repeat(cand_frame, P)  # (W*P,)

    keys = s.work_keys.reshape(n, -1)
    shrink = s.work_shrink.reshape(n)
    sel = s.work_sel.reshape(n, -1)
    values = s.work_values.reshape(O, n, -1)
    usage = (s.work_use / s.work_life).reshape(n)

    # prototypes = highest normalized-usage candidate tokens
    u_masked = jnp.where(cand_tok, usage, -jnp.inf)
    topv, proto_idx = jax.lax.top_k(u_masked, k_p)
    proto_ok = topv > -jnp.inf
    proto_keys = keys[proto_idx]
    proto_sel = sel[proto_idx]

    # potentiation: softmax affinity of all candidates onto each prototype,
    # queried WITH the prototypes' selection term (memory_manager.py:264)
    sim = get_similarity(keys, shrink, proto_keys, proto_sel)  # (n, k_p)
    sim = jnp.where(cand_tok[:, None], sim, -jnp.inf)
    m = jnp.max(sim, axis=0, keepdims=True)
    e = jnp.where(cand_tok[:, None], jnp.exp(sim - m), 0.0)
    aff = e / jnp.maximum(e.sum(axis=0, keepdims=True), 1e-30)  # (n, k_p)
    proto_values = jnp.einsum("nk,onc->okc", aff, values)
    proto_shrink = aff.T @ shrink

    # long-term eviction (remove_obsolete_features): when the store reaches
    # max_long_term_elements - num_prototypes, keep only tokens whose
    # normalized usage is STRICTLY above the k-th smallest (ties evicted)
    lcount = jnp.sum(s.lt_valid)
    drop = lcount - (L - k_p)

    def evict(st: MemoryState) -> MemoryState:
        lu = jnp.where(st.lt_valid, st.lt_use / st.lt_life, jnp.inf)
        order = jnp.sort(lu)  # ascending; invalid slots last
        thr = order[jnp.clip(drop - 1, 0, L - 1)]
        return st._replace(lt_valid=st.lt_valid & (lu > thr))

    s = jax.lax.cond(
        (lcount >= L - k_p) & (drop > 0), evict, lambda st: st, s
    )

    # append prototypes into the first k_p free long-term slots
    dst = jax.lax.top_k(1.0 - s.lt_valid.astype(jnp.float32), k_p)[1]

    def put(old, new, axis0=False):
        # similarity/affinity math runs in f32; cast back so scatters into
        # bf16 stores stay bf16 (implicit down-cast scatters are deprecated)
        new = jnp.asarray(new, old.dtype)
        if axis0:  # (O, L, Cv)
            cur = old[:, dst]
            selv = jnp.where(proto_ok[None, :, None], new, cur)
            return old.at[:, dst].set(selv)
        cur = old[dst]
        shape = (k_p,) + (1,) * (new.ndim - 1)
        selv = jnp.where(proto_ok.reshape(shape), new, cur)
        return old.at[dst].set(selv)

    s = s._replace(
        lt_keys=put(s.lt_keys, proto_keys),
        lt_shrink=put(s.lt_shrink, proto_shrink),
        lt_values=put(s.lt_values, proto_values, axis0=True),
        lt_use=put(s.lt_use, jnp.zeros((k_p,), jnp.float32)),
        lt_life=put(s.lt_life, jnp.full((k_p,), 1e-7, jnp.float32)),
        lt_valid=s.lt_valid.at[dst].set(
            jnp.where(proto_ok, True, s.lt_valid[dst])
        ),
    )
    # sieve: consolidated frames leave the working store
    return s._replace(work_valid=s.work_valid & ~cand_frame)


def insert_working(
    state: MemoryState,
    cfg: MemoryConfig,
    keys: jnp.ndarray,  # (P, Ck)
    shrink: jnp.ndarray,  # (P,)
    sel: jnp.ndarray,  # (P, Ck) selection (e_proj) for potentiation
    values: jnp.ndarray,  # (O, P, Cv)
    enabled: jnp.ndarray,  # scalar bool — masked no-op when False
) -> MemoryState:
    """One ``MemoryManager.add_memory``: write the frame into the working
    store, then consolidate if the store reached ``max_mt_frames``."""
    W = cfg.max_mt_frames

    def write(s: MemoryState) -> MemoryState:
        stamp = s.next_stamp
        slot = jnp.where(stamp == 0, 0, 1 + (stamp - 1) % (W - 1))
        s = s._replace(
            work_keys=s.work_keys.at[slot].set(keys),
            work_shrink=s.work_shrink.at[slot].set(shrink),
            work_sel=s.work_sel.at[slot].set(sel),
            work_values=s.work_values.at[:, slot].set(values),
            work_use=s.work_use.at[slot].set(0.0),
            work_life=s.work_life.at[slot].set(1e-7),
            work_valid=s.work_valid.at[slot].set(True),
            work_stamp=s.work_stamp.at[slot].set(stamp),
            next_stamp=stamp + 1,
        )
        return jax.lax.cond(
            jnp.sum(s.work_valid) >= W,
            lambda st: _consolidate(st, cfg),
            lambda st: st,
            s,
        )

    return jax.lax.cond(enabled, write, lambda s: s, state)


def read_memory(
    state: MemoryState,
    cfg: MemoryConfig,
    qk: jnp.ndarray,  # (P, Ck) query keys
    qe: Optional[jnp.ndarray],  # (P, Ck) selection
    update_usage=True,  # bool or traced bool: whether this match "counts"
) -> Tuple[jnp.ndarray, MemoryState]:
    """``MemoryManager.match_memory``: top-k softmax readout over
    [long-term, working] tokens, recording usage.

    Returns ((O, P, Cv) readout, state with updated use/life counts).
    An empty memory reads as zeros with no usage side effects (the
    reference never matches an empty store — need_segment guards it).
    ``update_usage=False`` computes the readout without the use/life side
    effects — the scan calls read every step for static shape, but in the
    reference ``need_segment`` gates whether a match happens at all
    (inference_core.py:55, False on step()-mode reference frames where
    valid_labels is passed).
    """
    W, P, L, O = (cfg.max_mt_frames, cfg.tokens_per_frame, cfg.lt_capacity,
                  cfg.num_objects)
    mk = jnp.concatenate([state.lt_keys, state.work_keys.reshape(W * P, -1)])
    ms = jnp.concatenate([state.lt_shrink, state.work_shrink.reshape(W * P)])
    valid = jnp.concatenate(
        [state.lt_valid, jnp.repeat(state.work_valid, P)]
    )
    mv = jnp.concatenate(
        [state.lt_values, state.work_values.reshape(O, W * P, -1)], axis=1
    )
    sim = get_similarity(mk, ms, qk, qe)  # (N, P)
    affinity, usage = topk_softmax(sim, cfg.top_k, valid)
    out = jnp.stack([readout(affinity, mv[o]) for o in range(O)])

    # update_usage (kv_memory_store.py:92-99): use += affinity mass,
    # life += 1 for every resident token; long-term only when
    # enable_long_term_count_usage
    matched = valid.any() & update_usage  # a match actually ran and counts
    lt_usage_delta = usage[:L]
    work_usage_delta = usage[L:].reshape(W, P)
    work_live = (state.work_valid & matched)[:, None]
    state = state._replace(
        work_use=state.work_use + jnp.where(work_live, work_usage_delta, 0.0),
        work_life=state.work_life + jnp.where(work_live, 1.0, 0.0),
    )
    if cfg.count_long_usage:
        lt_live = state.lt_valid & matched
        state = state._replace(
            lt_use=state.lt_use + jnp.where(lt_live, lt_usage_delta, 0.0),
            lt_life=state.lt_life + jnp.where(lt_live, 1.0, 0.0),
        )
    return out.astype(state.work_values.dtype), state
