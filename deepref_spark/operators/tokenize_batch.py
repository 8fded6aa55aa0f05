"""Vectorized batch twin of refsem.bert_entity_tokenize (K1).

The per-row kernel costs ~30 Python ops/row (segment joins, wordpiece
dict hits, list pads) inside every Arrow batch; at web scale that loop
IS the flagship's hot path (bench: kg_triples_model was the #1 query).
This module computes the identical (ids, mask, pos1, pos2) for a WHOLE
batch with flat numpy gather/scatter over a per-word piece-id cache:

  1. flatten the batch's token lists once; factorize to unique words;
  2. per unique word (Zipf => few per batch after warmup) look up the
     cached piece-id array (greedy wordpiece + portable md5 ids, exactly
     refsem.tokenize_text + piece_to_id);
  3. rebuild every row's [CLS] s0 [m] e0 [m] s1 [m] e1 [m] s2 [SEP]
     layout with O(total_pieces) repeat/cumsum gather-scatters — zero
     per-row Python.

Bit-identity with the scalar kernel is asserted by
tests/test_tokenize_batch.py (hypothesis property over adversarial
span layouts) and the existing fused-vs-modular parity tests.

Rows with NEGATIVE span indexes (the -1/-2/-3 get_entities sentinels,
reference deepref/dataset/converters/utils.py) follow Python slice
semantics, which clip-based vector math cannot reproduce; those rows
fall back to the scalar kernel row-by-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deepref_spark import refsem

# Per-process memo caches are CAPPED: at web scale the distinct-token
# universe (URLs, hashes, typos) is unbounded, and a long-lived worker
# would otherwise grow these dicts forever. clear() at the cap keeps
# memory bounded (~tens of MB) and the Zipf head re-warms in one batch.
_WORD_IDS_CAP = 250_000
_WORD_IDS: dict[str, np.ndarray] = {}

_CLS = refsem.SPECIAL_TOKENS["[CLS]"]
_SEP = refsem.SPECIAL_TOKENS["[SEP]"]
_U0, _U1 = refsem.SPECIAL_TOKENS["[unused0]"], refsem.SPECIAL_TOKENS["[unused1]"]
_U2, _U3 = refsem.SPECIAL_TOKENS["[unused2]"], refsem.SPECIAL_TOKENS["[unused3]"]
_U4, _U5 = refsem.SPECIAL_TOKENS["[unused4]"], refsem.SPECIAL_TOKENS["[unused5]"]


def _compute_word_ids(word: str, wp) -> np.ndarray:
    # tokenize_text(" ".join(words)) === per word: word.split() then wp
    # on each fragment (str.split drops empties / splits whitespace runs,
    # exactly like the joined round-trip).
    pieces = [p for sub in word.split() for p in wp(sub)]
    return np.fromiter(
        (refsem.piece_to_id(p) for p in pieces), dtype=np.int64, count=len(pieces)
    )


def _word_ids_lookup(uniques, wp) -> list[np.ndarray]:
    if wp is None or wp is refsem.wordpiece_real:
        cache, wp_eff = _WORD_IDS, refsem.wordpiece_real
    else:
        cache, wp_eff = {}, wp  # custom wp: no cross-batch reuse
    out = []
    for w in uniques:
        hit = cache.get(w)
        if hit is None:
            if len(cache) >= _WORD_IDS_CAP:
                cache.clear()
            hit = _compute_word_ids(w, wp_eff)
            cache[w] = hit
        out.append(hit)
    return out


def bert_entity_tokenize_batch(
    tokens_list,
    h0,
    h1,
    t0,
    t1,
    max_length: int = 128,
    mask_entity: bool = False,
    wp=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch K1: returns (ids[B,L], mask[B,L], pos1[B], pos2[B]) equal
    element-wise to refsem.bert_entity_tokenize per row."""
    B = len(tokens_list)
    ML = max_length
    h0 = np.asarray(h0, dtype=np.int64)
    h1 = np.asarray(h1, dtype=np.int64)
    t0 = np.asarray(t0, dtype=np.int64)
    t1 = np.asarray(t1, dtype=np.int64)
    ids_out = np.zeros((B, ML), dtype=np.int64)
    if B == 0:
        z = np.zeros(0, dtype=np.int64)
        return ids_out, np.zeros((0, ML), dtype=np.int64), z, z

    n_words = np.fromiter((len(t) for t in tokens_list), dtype=np.int64, count=B)
    flat_words: list = []
    for t in tokens_list:
        flat_words.extend(t)
    if flat_words:
        codes, uniques = pd.factorize(np.asarray(flat_words, dtype=object))
        uarrs = _word_ids_lookup(uniques, wp)
        ulens = np.fromiter((a.size for a in uarrs), dtype=np.int64, count=len(uarrs))
        U = np.concatenate(uarrs) if len(uarrs) else np.zeros(0, dtype=np.int64)
        ustarts = np.concatenate(([0], np.cumsum(ulens)))[:-1]
        pc = ulens[codes]
    else:
        U = np.zeros(0, dtype=np.int64)
        ustarts = np.zeros(0, dtype=np.int64)
        codes = np.zeros(0, dtype=np.int64)
        pc = np.zeros(0, dtype=np.int64)

    W = int(n_words.sum())
    cumP = np.zeros(W + 1, dtype=np.int64)
    np.cumsum(pc, out=cumP[1:])
    Woff = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(n_words, out=Woff[1:])

    # flat piece-id stream aligned to flat word order
    tot_pieces = int(cumP[-1])
    if tot_pieces:
        within = np.arange(tot_pieces, dtype=np.int64) - np.repeat(cumP[:-1], pc)
        flat_ids = U[np.repeat(ustarts[codes], pc) + within]
    else:
        flat_ids = np.zeros(0, dtype=np.int64)

    rev = h0 > t0
    min0 = np.where(rev, t0, h0)
    min1 = np.where(rev, t1, h1)
    max0 = np.where(rev, h0, t0)
    max1 = np.where(rev, h1, t1)

    def gb(word_idx):  # global piece boundary at a clipped word index
        return cumP[Woff[:-1] + np.clip(word_idx, 0, n_words)]

    g_start, g_end = cumP[Woff[:-1]], cumP[Woff[1:]]
    gm0, gm1, gx0, gx1 = gb(min0), gb(min1), gb(max0), gb(max1)

    zero = np.zeros(B, dtype=np.int64)
    L0 = np.maximum(zero, gm0 - g_start)   # sent0 pieces
    L1 = np.maximum(zero, gm1 - gm0)       # ent0 pieces (pre-marker)
    L2 = np.maximum(zero, gx0 - gm1)       # sent1 pieces
    L3 = np.maximum(zero, gx1 - gx0)       # ent1 pieces
    L4 = np.maximum(zero, g_end - gx1)     # sent2 pieces
    E0 = np.full(B, 1, dtype=np.int64) if mask_entity else L1 + 2
    E1 = np.full(B, 1, dtype=np.int64) if mask_entity else L3 + 2

    d_s0 = np.full(B, 1, dtype=np.int64)
    d_e0 = d_s0 + L0
    d_s1 = d_e0 + E0
    d_e1 = d_s1 + L2
    d_s2 = d_e1 + E1
    d_sep = d_s2 + L4
    total = d_sep + 1

    rows = np.arange(B, dtype=np.int64)

    def scatter_seg(src_start, lens, dest_start):
        tot = int(lens.sum())
        if not tot:
            return
        seg_within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        src = np.repeat(src_start, lens) + seg_within
        dst = np.repeat(dest_start, lens) + seg_within
        rr = np.repeat(rows, lens)
        ok = dst < ML
        ids_out[rr[ok], dst[ok]] = flat_ids[src[ok]]

    def put(dest, vals):
        ok = dest < ML
        ids_out[rows[ok], dest[ok]] = vals[ok] if isinstance(vals, np.ndarray) else vals

    ids_out[:, 0] = _CLS
    scatter_seg(g_start, L0, d_s0)
    scatter_seg(gm1, L2, d_s1)
    scatter_seg(gx1, L4, d_s2)
    if mask_entity:
        put(d_e0, np.where(rev, _U5, _U4))
        put(d_e1, np.where(rev, _U4, _U5))
    else:
        put(d_e0, np.where(rev, _U2, _U0))
        scatter_seg(gm0, L1, d_e0 + 1)
        put(d_e0 + 1 + L1, np.where(rev, _U3, _U1))
        put(d_e1, np.where(rev, _U0, _U2))
        scatter_seg(gx0, L3, d_e1 + 1)
        put(d_e1 + 1 + L3, np.where(rev, _U1, _U3))
    put(d_sep, _SEP)

    mask = (np.arange(ML, dtype=np.int64)[None, :] < np.minimum(total, ML)[:, None]).astype(np.int64)
    pos_min_marker = d_s0 + L0          # 1 + len(sent0)
    pos_max_marker = d_s1 + L2          # 1 + len(sent0) + len(ent0) + len(sent1)
    pos1 = np.minimum(ML - 1, np.where(rev, pos_max_marker, pos_min_marker))
    pos2 = np.minimum(ML - 1, np.where(rev, pos_min_marker, pos_max_marker))

    # scalar fallback for negative-index rows (Python slice semantics)
    neg = (h0 < 0) | (h1 < 0) | (t0 < 0) | (t1 < 0)
    if neg.any():
        for r in np.flatnonzero(neg):
            s_ids, s_mask, s_p1, s_p2 = refsem.bert_entity_tokenize(
                list(tokens_list[r]), [int(h0[r]), int(h1[r])],
                [int(t0[r]), int(t1[r])], max_length=ML,
                mask_entity=mask_entity, wp=wp,
            )
            ids_out[r] = s_ids
            mask[r] = s_mask
            pos1[r] = s_p1
            pos2[r] = s_p2

    return ids_out, mask, pos1, pos2


_U6, _U7 = refsem.SPECIAL_TOKENS["[unused6]"], refsem.SPECIAL_TOKENS["[unused7]"]


def _flat_word_ids(words, wp):
    """factorize a flat word/string array -> (codes-aligned piece
    counts, flat piece-id stream, per-entry src starts). Entries may
    contain whitespace (SK strings): _compute_word_ids' word.split()
    reproduces tokenize_text exactly."""
    codes, uniques = pd.factorize(np.asarray(words, dtype=object))
    uarrs = _word_ids_lookup(uniques, wp)
    ulens = np.fromiter((a.size for a in uarrs), dtype=np.int64, count=len(uarrs))
    U = np.concatenate(uarrs) if len(uarrs) else np.zeros(0, dtype=np.int64)
    ustarts = np.concatenate(([0], np.cumsum(ulens)))[:-1]
    return ulens[codes], U, ustarts[codes]


def ebem_tokenize_batch(
    tokens_list,
    h0, h1, t0, t1,
    s1f, s1l, s2f, s2l,
    max_length: int = 128,
    mask_entity: bool = False,
    wp=None,
):
    """Batch K2 (EBEM): element-wise equal to refsem.ebem_tokenize.

    The scalar kernel recovers positions with .index() first-occurrence
    scans. For almost every row no sentence/SK piece is a literal
    ``[unusedX]`` string, so each marker occurs ONLY at its known
    insert offsets and first-occurrence is the min over those —
    including the documented mask_entity shadowing quirk where the
    entity placeholder [unused4/5] shadows the SK wrapper of the same
    name (bert_encoder.py:390-404). The pinned vocab artifact DOES
    contain the special tokens, so a document that literally says
    "[unused3]" wordpieces to that exact piece; piece ids 4..11 are
    reserved for the markers (hashed ids start at 12), so such rows
    are detected by id range and routed through the scalar kernel.

    s1f/s1l/s2f/s2l are the SK father/grandpa strings AFTER the
    empty-fallback (caller substitutes [h_name, h_name])."""
    B = len(tokens_list)
    ML = max_length
    h0 = np.asarray(h0, dtype=np.int64)
    h1 = np.asarray(h1, dtype=np.int64)
    t0 = np.asarray(t0, dtype=np.int64)
    t1 = np.asarray(t1, dtype=np.int64)
    ids_out = np.zeros((B, ML), dtype=np.int64)
    if B == 0:
        z = np.zeros(0, dtype=np.int64)
        z2 = np.zeros((0, 2), dtype=np.int64)
        return ids_out, np.zeros((0, ML), dtype=np.int64), z, z, z2, z2

    n_words = np.fromiter((len(t) for t in tokens_list), dtype=np.int64, count=B)
    flat_words: list = []
    for t in tokens_list:
        flat_words.extend(t)
    if flat_words:
        pc, U, src0 = _flat_word_ids(flat_words, wp)
    else:
        pc = np.zeros(0, dtype=np.int64)
        U = np.zeros(0, dtype=np.int64)
        src0 = np.zeros(0, dtype=np.int64)
    W = int(n_words.sum())
    cumP = np.zeros(W + 1, dtype=np.int64)
    np.cumsum(pc, out=cumP[1:])
    Woff = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(n_words, out=Woff[1:])
    tot_pieces = int(cumP[-1])
    if tot_pieces:
        within = np.arange(tot_pieces, dtype=np.int64) - np.repeat(cumP[:-1], pc)
        flat_ids = U[np.repeat(src0, pc) + within]
    else:
        flat_ids = np.zeros(0, dtype=np.int64)

    # SK strings: one factorize over the 4B entries, aligned per group
    sk_all = list(s1f) + list(s1l) + list(s2f) + list(s2l)
    sk_pc, skU, sk_src = _flat_word_ids(sk_all, wp)
    F1, G1 = sk_pc[0:B], sk_pc[B:2 * B]
    F2, G2 = sk_pc[2 * B:3 * B], sk_pc[3 * B:4 * B]

    rev = h0 > t0
    min0 = np.where(rev, t0, h0)
    min1 = np.where(rev, t1, h1)
    max0 = np.where(rev, h0, t0)
    max1 = np.where(rev, h1, t1)

    def gb(word_idx):
        return cumP[Woff[:-1] + np.clip(word_idx, 0, n_words)]

    g_start, g_end = cumP[Woff[:-1]], cumP[Woff[1:]]
    gm0, gm1, gx0, gx1 = gb(min0), gb(min1), gb(max0), gb(max1)
    zero = np.zeros(B, dtype=np.int64)
    L0 = np.maximum(zero, gm0 - g_start)
    L1 = np.maximum(zero, gm1 - gm0)
    L2 = np.maximum(zero, gx0 - gm1)
    L3 = np.maximum(zero, gx1 - gx0)
    L4 = np.maximum(zero, g_end - gx1)
    one = np.full(B, 1, dtype=np.int64)
    E0c = one if mask_entity else L1  # ent core length (inside the wrap)
    E1c = one if mask_entity else L3

    p_e0_open = 1 + L0
    p_e0_core = p_e0_open + 1
    p_e0_close = p_e0_open + 1 + E0c
    p_e1_open = p_e0_close + 1 + L2
    p_e1_core = p_e1_open + 1
    p_e1_close = p_e1_open + 1 + E1c
    p_sk1_open = p_e1_close + 1 + L4
    p_sk1_close = p_sk1_open + 1 + F1 + G1
    p_sk2_open = p_sk1_close + 1
    p_sk2_close = p_sk2_open + 1 + F2 + G2
    p_sep = p_sk2_close + 1
    total = p_sep + 1

    rows = np.arange(B, dtype=np.int64)

    def scatter_seg(flat_src, src_start, lens, dest_start):
        tot = int(lens.sum())
        if not tot:
            return
        seg_within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        src = np.repeat(src_start, lens) + seg_within
        dst = np.repeat(dest_start, lens) + seg_within
        rr = np.repeat(rows, lens)
        ok = dst < ML
        ids_out[rr[ok], dst[ok]] = flat_src[src[ok]]

    def put(dest, vals):
        ok = dest < ML
        ids_out[rows[ok], dest[ok]] = vals[ok] if isinstance(vals, np.ndarray) else vals

    ids_out[:, 0] = _CLS
    scatter_seg(flat_ids, g_start, L0, np.full(B, 1, dtype=np.int64))  # sent0
    scatter_seg(flat_ids, gm1, L2, p_e0_close + 1)                     # sent1
    scatter_seg(flat_ids, gx1, L4, p_e1_close + 1)                     # sent2
    put(p_e0_open, np.where(rev, _U2, _U0))
    put(p_e0_close, np.where(rev, _U3, _U1))
    put(p_e1_open, np.where(rev, _U0, _U2))
    put(p_e1_close, np.where(rev, _U1, _U3))
    if mask_entity:
        put(p_e0_core, np.where(rev, _U5, _U4))
        put(p_e1_core, np.where(rev, _U4, _U5))
    else:
        scatter_seg(flat_ids, gm0, L1, p_e0_core)
        scatter_seg(flat_ids, gx0, L3, p_e1_core)
    put(p_sk1_open, np.where(rev, _U6, _U4))
    put(p_sk1_close, np.where(rev, _U7, _U5))
    put(p_sk2_open, np.where(rev, _U4, _U6))
    put(p_sk2_close, np.where(rev, _U5, _U7))
    scatter_seg(skU, sk_src[0:B], F1, p_sk1_open + 1)            # sk1 father
    scatter_seg(skU, sk_src[B:2 * B], G1, p_sk1_open + 1 + F1)   # sk1 grandpa
    scatter_seg(skU, sk_src[2 * B:3 * B], F2, p_sk2_open + 1)    # sk2 father
    scatter_seg(skU, sk_src[3 * B:4 * B], G2, p_sk2_open + 1 + F2)
    put(p_sep, _SEP)

    att_mask = (
        np.arange(ML, dtype=np.int64)[None, :] < np.minimum(total, ML)[:, None]
    ).astype(np.int64)

    clamp = lambda p: np.minimum(ML - 1, p)  # noqa: E731
    if mask_entity:
        # [unused4]/[unused5] entity cores shadow the SK wrappers
        sk1a = np.where(rev, p_sk1_open, p_e0_core)   # idx("[u4]"|"[u6]")
        sk1b = np.where(rev, p_sk1_close, p_e1_core)  # idx("[u5]"|"[u7]")
        sk2a = np.where(rev, p_e1_core, p_sk2_open)   # idx("[u6]"|"[u4]")
        sk2b = np.where(rev, p_e0_core, p_sk2_close)  # idx("[u7]"|"[u5]")
        pos1 = p_e0_core  # idx of [u4] (fwd) / [u5] (rev) = ent0 core
        pos2 = p_e1_core
    else:
        sk1a, sk1b = p_sk1_open, p_sk1_close
        sk2a, sk2b = p_sk2_open, p_sk2_close
        pos1 = p_e0_open  # idx of [u0] (fwd) / [u2] (rev) = ent0 open
        pos2 = p_e1_open
    sk_pos1 = np.stack([clamp(sk1a), clamp(sk1b)], axis=1)
    sk_pos2 = np.stack([clamp(sk2a), clamp(sk2b)], axis=1)
    pos1 = clamp(pos1)
    pos2 = clamp(pos2)

    # scalar fallback: negative indexes (Python slice semantics) OR any
    # literal marker piece (id 4..11) in the row's sentence/SK text —
    # the .index() scans would find the in-sentence occurrence first
    slow = (h0 < 0) | (h1 < 0) | (t0 < 0) | (t1 < 0)
    tok_marker = (flat_ids >= _U0) & (flat_ids <= _U7)
    if tok_marker.any():
        word_rows = np.repeat(np.arange(B, dtype=np.int64), n_words)
        piece_rows = np.repeat(word_rows, pc)
        slow |= np.bincount(piece_rows[tok_marker], minlength=B).astype(bool)
    # cheap unique-level gate first: skU is the deduplicated piece
    # array, so the common no-literal-marker case skips the full
    # per-entry stream reconstruction entirely
    tot_sk = int(sk_pc.sum())
    if tot_sk and ((skU >= _U0) & (skU <= _U7)).any():
        sk_within = np.arange(tot_sk, dtype=np.int64) - np.repeat(
            np.cumsum(sk_pc) - sk_pc, sk_pc
        )
        sk_stream = skU[np.repeat(sk_src, sk_pc) + sk_within]
        sk_marker = (sk_stream >= _U0) & (sk_stream <= _U7)
        if sk_marker.any():
            entry_rows = np.repeat(
                np.arange(4 * B, dtype=np.int64) % B, sk_pc
            )
            slow |= np.bincount(entry_rows[sk_marker], minlength=B).astype(bool)
    if slow.any():
        for r in np.flatnonzero(slow):
            out = refsem.ebem_tokenize(
                list(tokens_list[r]), [int(h0[r]), int(h1[r])],
                [int(t0[r]), int(t1[r])],
                {"ses1": [s1f[r], s1l[r]], "ses2": [s2f[r], s2l[r]]},
                max_length=ML, mask_entity=mask_entity, wp=wp,
            )
            ids_out[r] = out["ids"]
            att_mask[r] = out["att_mask"]
            pos1[r] = out["pos1"]
            pos2[r] = out["pos2"]
            sk_pos1[r] = out["sk_pos1"]
            sk_pos2[r] = out["sk_pos2"]

    return ids_out, att_mask, pos1, pos2, sk_pos1, sk_pos2


_WORD_VOCAB_IDS: dict[str, int] = {}


def word_position_tokenize_batch(
    tokens_list, h0, t0, max_length: int = 128
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch K3: whole-word vocab ids + relative-position features,
    element-wise equal to refsem.word_position_tokenize per row."""
    B = len(tokens_list)
    ML = max_length
    h0 = np.asarray(h0, dtype=np.int64)
    t0 = np.asarray(t0, dtype=np.int64)
    ids = np.zeros((B, ML), dtype=np.int64)
    if B == 0:
        return ids, np.zeros((0, ML), dtype=np.int64), np.zeros((0, ML), dtype=np.int64)

    n_words = np.fromiter((len(t) for t in tokens_list), dtype=np.int64, count=B)
    n_eff = np.minimum(n_words, ML)
    flat_words: list = []
    for t, ne in zip(tokens_list, n_eff):
        flat_words.extend(t[:ne])
    if flat_words:
        codes, uniques = pd.factorize(np.asarray(flat_words, dtype=object))
        uids = np.empty(len(uniques), dtype=np.int64)
        for i, w in enumerate(uniques):
            v = _WORD_VOCAB_IDS.get(w)
            if v is None:
                if len(_WORD_VOCAB_IDS) >= _WORD_IDS_CAP:
                    _WORD_VOCAB_IDS.clear()
                v = refsem.word_to_id(w)
                _WORD_VOCAB_IDS[w] = v
            uids[i] = v
        flat_ids = uids[codes]
        tot = int(n_eff.sum())
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(n_eff) - n_eff, n_eff
        )
        ids[np.repeat(np.arange(B, dtype=np.int64), n_eff), within] = flat_ids

    ar = np.arange(ML, dtype=np.int64)[None, :]
    live = ar < n_eff[:, None]  # positions past len(token) stay 0-padded
    p1i = np.minimum(h0, ML)[:, None]
    p2i = np.minimum(t0, ML)[:, None]
    pos1 = np.where(live, np.minimum(ar - p1i + ML, 2 * ML - 1), 0)
    pos2 = np.where(live, np.minimum(ar - p2i + ML, 2 * ML - 1), 0)
    return ids, pos1, pos2


def pcnn_segment_mask_batch(n_tokens, h0, t0, max_length: int = 128) -> np.ndarray:
    """Batch K4: piecewise segment labels (1/2/3, 0-padded), equal to
    refsem.pcnn_segment_mask per row."""
    ML = max_length
    n = np.minimum(np.asarray(n_tokens, dtype=np.int64), ML)[:, None]
    p1i = np.minimum(np.asarray(h0, dtype=np.int64), ML)[:, None]
    p2i = np.minimum(np.asarray(t0, dtype=np.int64), ML)[:, None]
    lo = np.minimum(p1i, p2i)
    hi = np.maximum(p1i, p2i)
    ar = np.arange(ML, dtype=np.int64)[None, :]
    seg = np.where(ar <= lo, 1, np.where(ar <= hi, 2, 3))
    return np.where(ar < n, seg, 0)
