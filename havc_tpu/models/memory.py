"""Fixed-shape exemplar memory bank (the lax.scan answer to XMem).

Rebuild of ColorMNet's memory system (reference:
vsdeoldify/colormnet/inference/memory_manager.py:8-288 ``MemoryManager``,
kv_memory_store.py (231 LoC), inference_core.py:9-231 ``InferenceCore``):
working memory inserted every ``mem_every=5`` frames, long-term memory
potentiated from high-usage working tokens when the working budget is
exceeded, LRU eviction, top-k=30 softmax readout, plus a "permanent"
reference-frame store (the exemplar images).

The reference grows/shrinks tensors dynamically and resets on a VRAM
watchdog (colormnet_render.py:201-221).  Under XLA everything must be
static-shape, so each store is a preallocated ring with a validity mask:

* **permanent store**: reference-frame tokens, never evicted
  (``perm_frames`` x P tokens).
* **working ring**: ``work_frames`` frame-slots; writing past capacity
  overwrites the oldest slot (LRU by construction) — but first the evicted
  frame's top-``n_proto``-usage tokens are *consolidated* into
* **long-term ring**: ``lt_tokens`` token slots, overwritten FIFO.

All inserts/evictions are masked scatters with static shapes, so the whole
video propagation is one ``lax.scan``.  The VRAM watchdog disappears: the
budget is the static shape itself (the reference's
``max_memory_frames``/``DEF_MAX_MEMORY_FRAMES`` role).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .colormnet import get_similarity, readout, topk_softmax

__all__ = ["MemoryConfig", "MemoryState", "init_memory", "insert_reference",
           "insert_working", "read_memory"]


class MemoryConfig(NamedTuple):
    key_dim: int = 64
    value_dim: int = 512
    num_objects: int = 2
    tokens_per_frame: int = 324  # P = (H/16)*(W/16) at working resolution
    perm_frames: int = 8  # reference-frame slots
    work_frames: int = 10  # reference max_mid_term_frames=10
    min_work_frames: int = 5  # reference min_mid_term_frames=5
    lt_tokens: int = 1280  # long-term token capacity
    n_proto: int = 128  # prototypes per consolidation (reference P=128)
    top_k: int = 30  # reference top-k readout
    mem_every: int = 5


class MemoryState(NamedTuple):
    """All rings concatenated views are formed at read time."""

    # permanent (reference) store
    perm_keys: jnp.ndarray  # (perm_frames*P, Ck)
    perm_shrink: jnp.ndarray  # (perm_frames*P,)
    perm_values: jnp.ndarray  # (O, perm_frames*P, Cv)
    perm_valid: jnp.ndarray  # (perm_frames*P,) bool
    perm_ptr: jnp.ndarray  # scalar int32: next reference slot

    # working store (frame granularity; slots freed by consolidation)
    work_keys: jnp.ndarray  # (work_frames, P, Ck)
    work_shrink: jnp.ndarray  # (work_frames, P)
    work_values: jnp.ndarray  # (O, work_frames, P, Cv)
    work_usage: jnp.ndarray  # (work_frames, P)
    work_valid: jnp.ndarray  # (work_frames,) bool
    work_t: jnp.ndarray  # (work_frames,) int32 insertion stamp
    work_ptr: jnp.ndarray  # scalar int32: total inserts so far

    # long-term store (token granularity, usage-LRU overwrite)
    lt_keys: jnp.ndarray  # (lt_tokens, Ck)
    lt_shrink: jnp.ndarray  # (lt_tokens,)
    lt_values: jnp.ndarray  # (O, lt_tokens, Cv)
    lt_usage: jnp.ndarray  # (lt_tokens,)
    lt_valid: jnp.ndarray  # (lt_tokens,) bool
    lt_ptr: jnp.ndarray  # scalar int32 (retained for checkpoint compat)


def init_memory(cfg: MemoryConfig, dtype=jnp.float32) -> MemoryState:
    p = cfg.perm_frames * cfg.tokens_per_frame
    return MemoryState(
        perm_keys=jnp.zeros((p, cfg.key_dim), dtype),
        perm_shrink=jnp.ones((p,), dtype),
        perm_values=jnp.zeros((cfg.num_objects, p, cfg.value_dim), dtype),
        perm_valid=jnp.zeros((p,), bool),
        perm_ptr=jnp.zeros((), jnp.int32),
        work_keys=jnp.zeros((cfg.work_frames, cfg.tokens_per_frame, cfg.key_dim), dtype),
        work_shrink=jnp.ones((cfg.work_frames, cfg.tokens_per_frame), dtype),
        work_values=jnp.zeros(
            (cfg.num_objects, cfg.work_frames, cfg.tokens_per_frame, cfg.value_dim),
            dtype,
        ),
        work_usage=jnp.zeros((cfg.work_frames, cfg.tokens_per_frame), dtype),
        work_valid=jnp.zeros((cfg.work_frames,), bool),
        work_t=jnp.zeros((cfg.work_frames,), jnp.int32),
        work_ptr=jnp.zeros((), jnp.int32),
        lt_keys=jnp.zeros((cfg.lt_tokens, cfg.key_dim), dtype),
        lt_shrink=jnp.ones((cfg.lt_tokens,), dtype),
        lt_values=jnp.zeros((cfg.num_objects, cfg.lt_tokens, cfg.value_dim), dtype),
        lt_usage=jnp.zeros((cfg.lt_tokens,), dtype),
        lt_valid=jnp.zeros((cfg.lt_tokens,), bool),
        lt_ptr=jnp.zeros((), jnp.int32),
    )


def insert_reference(
    state: MemoryState,
    cfg: MemoryConfig,
    keys: jnp.ndarray,  # (P, Ck)
    shrink: jnp.ndarray,  # (P,)
    values: jnp.ndarray,  # (O, P, Cv)
    enabled: jnp.ndarray,  # scalar bool — masked no-op when False
) -> MemoryState:
    """Write a reference frame's tokens into the permanent store
    (InferenceCore.step_AnyExemplar reference insert).  Slots cycle if more
    references arrive than perm_frames (oldest reference overwritten)."""
    p = cfg.tokens_per_frame
    slot = (state.perm_ptr % cfg.perm_frames) * p
    idx = slot + jnp.arange(p)

    def write(s: MemoryState) -> MemoryState:
        return s._replace(
            perm_keys=s.perm_keys.at[idx].set(keys),
            perm_shrink=s.perm_shrink.at[idx].set(shrink),
            perm_values=s.perm_values.at[:, idx].set(values),
            perm_valid=s.perm_valid.at[idx].set(True),
            perm_ptr=s.perm_ptr + 1,
        )

    return jax.lax.cond(enabled, write, lambda s: s, state)


def _consolidate(state: MemoryState, cfg: MemoryConfig) -> MemoryState:
    """Global memory compression (memory_manager.compress_features +
    consolidation, memory_manager.py:214-288, static-shape form).

    Candidates = every working frame older than ``min_work_frames`` inserts
    EXCEPT the very first one (the reference's ``[HW:-min_work_elements]``
    slice protects the first frame permanently).  The ``n_proto``
    highest-usage candidate tokens become prototype keys; their VALUES are
    POTENTIATED — re-read from all candidates by softmax attention — not
    copied.  Prototypes overwrite the lowest-usage long-term slots
    (remove_obsolete_features LRU semantics)."""
    from .colormnet import get_similarity

    wf, P = cfg.work_frames, cfg.tokens_per_frame
    n = wf * P
    n_proto = min(cfg.n_proto, n)

    age_ok = state.work_t <= state.work_ptr - cfg.min_work_frames
    cand_frame = state.work_valid & age_ok & (state.work_t != 0)
    cand_tok = jnp.repeat(cand_frame, P)  # (wf*P,)

    keys = state.work_keys.reshape(n, -1)
    shrink = state.work_shrink.reshape(n)
    values = state.work_values.reshape(cfg.num_objects, n, -1)
    usage = state.work_usage.reshape(n)

    u_masked = jnp.where(cand_tok, usage, -jnp.inf)
    _, proto_idx = jax.lax.top_k(u_masked, n_proto)
    proto_valid = jnp.take(u_masked, proto_idx) > -jnp.inf
    proto_keys = keys[proto_idx]

    # potentiation: affinity of all candidates onto each prototype
    sim = get_similarity(keys, shrink, proto_keys, None)  # (n, n_proto)
    sim = jnp.where(cand_tok[:, None], sim, -1e30)
    m = jnp.max(sim, axis=0, keepdims=True)
    e = jnp.exp(sim - m)
    aff = e / jnp.maximum(e.sum(axis=0, keepdims=True), 1e-30)  # (n, n_proto)
    proto_values = jnp.einsum("np,onc->opc", aff, values)
    proto_shrink = aff.T @ shrink

    # long-term targets: lowest usage (invalid slots first)
    pri = jnp.where(state.lt_valid, state.lt_usage, -jnp.inf)
    _, dst = jax.lax.top_k(-pri, n_proto)

    def put(old, new_vals, axis0=False):
        if axis0:
            cur = old[:, dst]
            sel = jnp.where(proto_valid[None, :, None], new_vals, cur)
            return old.at[:, dst].set(sel)
        cur = old[dst]
        shape = (len(proto_valid),) + (1,) * (new_vals.ndim - 1)
        sel = jnp.where(proto_valid.reshape(shape), new_vals, cur)
        return old.at[dst].set(sel)

    new_lt_valid = state.lt_valid.at[dst].set(
        jnp.where(proto_valid, True, state.lt_valid[dst])
    )
    state = state._replace(
        lt_keys=put(state.lt_keys, proto_keys),
        lt_shrink=put(state.lt_shrink, proto_shrink),
        lt_values=put(state.lt_values, proto_values, axis0=True),
        lt_usage=state.lt_usage.at[dst].set(
            jnp.where(
                proto_valid,
                jnp.zeros((), state.lt_usage.dtype),
                state.lt_usage[dst],
            )
        ),
        lt_valid=new_lt_valid,
        lt_ptr=state.lt_ptr + n_proto,
    )
    # sieve: consolidated frames leave the working store
    return state._replace(
        work_valid=state.work_valid & ~cand_frame,
        work_usage=jnp.where(
            cand_frame[:, None],
            jnp.zeros((), state.work_usage.dtype),
            state.work_usage,
        ),
    )


def insert_working(
    state: MemoryState,
    cfg: MemoryConfig,
    keys: jnp.ndarray,  # (P, Ck)
    shrink: jnp.ndarray,  # (P,)
    values: jnp.ndarray,  # (O, P, Cv)
    enabled: jnp.ndarray,  # scalar bool (memory-frame cadence)
) -> MemoryState:
    """Insert the current frame into the working store; when it is full
    (reference: work size >= max_mid_term_frames), consolidate the old
    frames into long-term memory first (memory_manager.add_memory)."""

    def write(s: MemoryState) -> MemoryState:
        s = jax.lax.cond(
            s.work_valid.all(),
            lambda st: _consolidate(st, cfg),
            lambda st: st,
            s,
        )
        # write into the first free slot; the permanently-protected first
        # frame (work_t == 0) is never recycled
        free = ~s.work_valid
        pri = jnp.where(
            free, jnp.int32(-1),
            jnp.where(s.work_t == 0, jnp.iinfo(jnp.int32).max, s.work_t),
        )
        slot = jnp.argmin(pri)
        return s._replace(
            work_keys=s.work_keys.at[slot].set(keys),
            work_shrink=s.work_shrink.at[slot].set(shrink),
            work_values=s.work_values.at[:, slot].set(values),
            work_usage=s.work_usage.at[slot].set(
                jnp.zeros((), s.work_usage.dtype)
            ),
            work_valid=s.work_valid.at[slot].set(True),
            work_t=s.work_t.at[slot].set(s.work_ptr),
            work_ptr=s.work_ptr + 1,
        )

    return jax.lax.cond(enabled, write, lambda s: s, state)


def read_memory(
    state: MemoryState,
    cfg: MemoryConfig,
    qk: jnp.ndarray,  # (P, Ck) query keys
    qe: Optional[jnp.ndarray],  # (P, Ck) selection
) -> Tuple[jnp.ndarray, MemoryState]:
    """Top-k softmax readout over permanent + working + long-term tokens.

    Returns ((O, P, Cv) readout, state with updated working usage).
    """
    wf, p = cfg.work_frames, cfg.tokens_per_frame
    mk = jnp.concatenate(
        [state.perm_keys, state.work_keys.reshape(wf * p, -1), state.lt_keys]
    )
    ms = jnp.concatenate(
        [state.perm_shrink, state.work_shrink.reshape(wf * p), state.lt_shrink]
    )
    valid = jnp.concatenate(
        [
            state.perm_valid,
            jnp.repeat(state.work_valid, p),
            state.lt_valid,
        ]
    )
    mv = jnp.concatenate(
        [state.perm_values, state.work_values.reshape(cfg.num_objects, wf * p, -1),
         state.lt_values],
        axis=1,
    )
    sim = get_similarity(mk, ms, qk, qe)  # (N, P)
    affinity, usage = topk_softmax(sim, cfg.top_k, valid)
    out = jnp.stack([readout(affinity, mv[o]) for o in range(cfg.num_objects)])
    # accumulate usage for working (consolidation ranking) AND long-term
    # (LRU eviction ranking) slots — memory_manager update_usage semantics
    n_perm = state.perm_valid.shape[0]
    work_usage_delta = usage[n_perm : n_perm + wf * p].reshape(wf, p)
    lt_usage_delta = usage[n_perm + wf * p :]
    state = state._replace(
        work_usage=state.work_usage
        + work_usage_delta.astype(state.work_usage.dtype),
        lt_usage=state.lt_usage + lt_usage_delta.astype(state.lt_usage.dtype),
    )
    return out.astype(state.work_values.dtype), state
