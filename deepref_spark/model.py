"""Deterministic numpy stand-in for the BERT-entity forward pass with
production-shaped plumbing.

The reference scores batches with BERTEntityEncoder.forward + SoftmaxNN
(bert_encoder.py:122-142, softmax_nn.py:37-47): hidden states, gather
the head/tail entity-start states, concat (B, 2H), linear, fc, argmax.
torch/transformers are not in this container, so the encoder is a
deterministic numpy network with the SAME dataflow:

    emb[ids] * mask -> gather at pos1/pos2 -> concat -> tanh(linear)
    -> fc logits -> softmax -> (argmax id, max prob)

What is production-real here and carries to a 1000-executor cluster:
  * weights are a single broadcast variable (spark.sparkContext
    .broadcast of the weight dict), deserialized once per python worker
    and cached in a module-level singleton — the Spark analogue of the
    reference's per-GPU nn.DataParallel replica (sentence_re.py:75);
  * scoring is a mapInPandas over Arrow batches: the Arrow batch IS the
    reference's collate_fn batch (data_loader.py:42-50), whole-batch
    numpy matmuls, zero per-row Python;
  * a real HF checkpoint drops in by replacing ``forward_batch`` — the
    plumbing (broadcast, batch shapes, schema) is identical.

Everything is float64 and row-independent, so results are bit-stable
under any partitioning — the determinism the reference gets from seed
pinning (train.py:261-265) we get from pure functions.
"""

from __future__ import annotations

import numpy as np

from deepref_spark import refsem

HIDDEN = 64
SEED = 42


def build_weights(n_relations: int, vocab_size: int = refsem.VOCAB_SIZE, hidden: int = HIDDEN,
                  seed: int = SEED) -> dict:
    """Deterministic weight init (seed 42, like train.py:261-265;
    ablation runs pass alternate seeds like get_seeds at
    ablation_studies.py:162-176)."""
    rs = np.random.RandomState(seed)
    scale = 1.0 / np.sqrt(hidden)
    w = {
        "emb": rs.normal(0, 1.0, size=(vocab_size, hidden)) * scale,
        "w_lin": rs.normal(0, 1.0, size=(2 * hidden, 2 * hidden)) * scale,
        "b_lin": rs.normal(0, 0.1, size=(2 * hidden,)),
        "w_fc": rs.normal(0, 1.0, size=(2 * hidden, n_relations)) * scale,
        "b_fc": rs.normal(0, 0.1, size=(n_relations,)),
        "n_relations": n_relations,
    }
    # Calibrate away the untrained network's class prior: an untrained
    # random head gives one class a constant logit advantage that
    # swamps the per-row signal (argmax collapses to a single class).
    # Subtracting the neutral-input response (head/tail gathers = 0)
    # centers the logits so predictions track the input — the stand-in
    # for what training does to a real head.
    x0 = np.tanh(w["b_lin"])
    w["logit_offset"] = x0 @ w["w_fc"] + w["b_fc"]
    return w


def forward_batch(weights: dict, ids: np.ndarray, mask: np.ndarray,
                  pos1: np.ndarray, pos2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(B,L) int ids/mask + (B,) positions -> (pred_id (B,), score (B,)).

    Mirrors BERTEntityEncoder.forward's gather-concat-linear shape
    (bert_encoder.py:122-142) and SoftmaxNN's fc+softmax+max
    (softmax_nn.py:37-47, sentence_re.py:199).
    """
    # Context mixing: without it the gather at the entity-marker
    # positions would read the (constant) marker embedding and every
    # row would score identically. A bidirectional local mix makes the
    # marker states depend on the adjacent entity/context pieces — the
    # cheapest deterministic stand-in for attention that still yields
    # input-sensitive, class-diverse predictions.
    #
    # Only the two gathered positions feed the head, so the mix is
    # computed at those positions alone (identical float ops to the
    # full (B, L, H) tanh, ~L/2 x less work — this is the hot loop of
    # the whole pipeline).
    emb = weights["emb"]
    b = np.arange(ids.shape[0])
    L = ids.shape[1]

    def state_at(pos: np.ndarray) -> np.ndarray:
        def tok(p):
            p_c = np.clip(p, 0, L - 1)
            valid = ((p >= 0) & (p < L)).astype(np.float64) * mask[b, p_c]
            return emb[ids[b, p_c]] * valid[:, None]

        center, left, right = tok(pos), tok(pos - 1), tok(pos + 1)
        return np.tanh(3.0 * (center + 0.7 * left + 0.7 * right))

    head = state_at(pos1)                          # (B, H)
    tail = state_at(pos2)                          # (B, H)
    x = np.concatenate([head, tail], axis=1)       # (B, 2H)
    x = np.tanh(x @ weights["w_lin"] + weights["b_lin"])
    logits = x @ weights["w_fc"] + weights["b_fc"]  # (B, N)
    logits = (logits - weights["logit_offset"]) * 8.0  # centered + sharpened
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    pred = p.argmax(axis=1)
    return pred.astype(np.int32), p[b, pred]


def cached_weights(broadcast_var) -> dict:
    """Deserialized once per python worker: Spark's own broadcast layer
    caches .value per process, so no extra cache is needed (an earlier
    id()-keyed cache here collided across broadcasts after GC id reuse
    and served one model's weights to another — never key on id())."""
    return broadcast_var.value


def forward_cls_batch(weights: dict, ids: np.ndarray, mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """M1 — BERT-CLS variant (bert_encoder.py:30-39 + SoftmaxNN): the
    pooled representation is the [CLS]-position state (position 0) with
    the same local context mix; duplicated to the 2H head input so the
    same fc stack serves both encoders."""
    b = np.arange(ids.shape[0])
    pos0 = np.zeros(len(b), dtype=np.int64)
    emb = weights["emb"]
    L = ids.shape[1]

    def tok(p):
        p_c = np.clip(p, 0, L - 1)
        valid = ((p >= 0) & (p < L)).astype(np.float64) * mask[b, p_c]
        return emb[ids[b, p_c]] * valid[:, None]

    cls_state = np.tanh(3.0 * (tok(pos0) + 0.7 * tok(pos0 - 1) + 0.7 * tok(pos0 + 1)))
    x = np.concatenate([cls_state, cls_state], axis=1)
    x = np.tanh(x @ weights["w_lin"] + weights["b_lin"])
    logits = (x @ weights["w_fc"] + weights["b_fc"] - weights["logit_offset"]) * 8.0
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    pred = p.argmax(axis=1)
    return pred.astype(np.int32), p[b, pred]


def build_ebem_weights(n_relations: int, vocab_size: int = refsem.VOCAB_SIZE,
                       hidden: int = HIDDEN) -> dict:
    """M3 weights: EBEM concatenates head/tail entity states AND their
    SK father/grandpa states (4H input, bert_encoder.py:269-330's
    input_size = 4 * H) through a 3-linear funnel."""
    rs = np.random.RandomState(SEED + 1)
    scale = 1.0 / np.sqrt(hidden)
    in_sz = 4 * hidden
    w = {
        "emb": rs.normal(0, 1.0, size=(vocab_size, hidden)) * scale,
        "w1": rs.normal(0, 1.0, size=(in_sz, in_sz // 2)) * scale,
        "b1": rs.normal(0, 0.1, size=(in_sz // 2,)),
        "w2": rs.normal(0, 1.0, size=(in_sz // 2, in_sz // 4)) * scale,
        "b2": rs.normal(0, 0.1, size=(in_sz // 4,)),
        "w_fc": rs.normal(0, 1.0, size=(in_sz // 4, n_relations)) * scale,
        "b_fc": rs.normal(0, 0.1, size=(n_relations,)),
        "n_relations": n_relations,
    }
    x0 = np.tanh(np.tanh(w["b1"]) @ w["w2"] + w["b2"])
    w["logit_offset"] = x0 @ w["w_fc"] + w["b_fc"]
    return w


def forward_ebem_batch(weights: dict, ids: np.ndarray, mask: np.ndarray,
                       pos1: np.ndarray, pos2: np.ndarray,
                       sk_pos1: np.ndarray, sk_pos2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """M3 — EBEM forward (bert_encoder.py:269-330): entity-start gathers
    plus SK-position gathers (father position of each entity's SK pair),
    concat (B, 4H), linear funnel, softmax argmax."""
    emb = weights["emb"]
    b = np.arange(ids.shape[0])
    L = ids.shape[1]

    def state_at(pos: np.ndarray) -> np.ndarray:
        def tok(p):
            p_c = np.clip(p, 0, L - 1)
            valid = ((p >= 0) & (p < L)).astype(np.float64) * mask[b, p_c]
            return emb[ids[b, p_c]] * valid[:, None]

        return np.tanh(3.0 * (tok(pos) + 0.7 * tok(pos - 1) + 0.7 * tok(pos + 1)))

    head = state_at(pos1)
    tail = state_at(pos2)
    sk_head = state_at(sk_pos1[:, 0])
    sk_tail = state_at(sk_pos2[:, 0])
    x = np.concatenate([head, sk_head, tail, sk_tail], axis=1)  # (B, 4H)
    x = np.tanh(x @ weights["w1"] + weights["b1"])
    x = np.tanh(x @ weights["w2"] + weights["b2"])
    logits = (x @ weights["w_fc"] + weights["b_fc"] - weights["logit_offset"]) * 8.0
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    pred = p.argmax(axis=1)
    return pred.astype(np.int32), p[b, pred]


def build_cnn_weights(n_relations: int, vocab_size: int = refsem.VOCAB_SIZE,
                      hidden: int = HIDDEN, pos_dim: int = 5,
                      max_length: int = 128, window: int = 3,
                      seed: int = SEED + 2) -> dict:
    """M4/M5 weights: word ⊕ pos1 ⊕ pos2 embeddings -> 1-D conv ->
    (piecewise) max pool -> fc (cnn_encoder.py:46-65 /
    pcnn_encoder.py:54-80 dataflow)."""
    rs = np.random.RandomState(seed)
    in_dim = hidden + 2 * pos_dim
    scale = 1.0 / np.sqrt(in_dim)
    w = {
        "emb": rs.normal(0, 1.0, size=(vocab_size, hidden)) * (1.0 / np.sqrt(hidden)),
        "pos_emb": rs.normal(0, 1.0, size=(2 * max_length, pos_dim)) * 0.3,
        "conv": rs.normal(0, 1.0, size=(window * in_dim, hidden)) * scale,
        "b_conv": rs.normal(0, 0.1, size=(hidden,)),
        "w_fc": rs.normal(0, 1.0, size=(hidden, n_relations)) * (1.0 / np.sqrt(hidden)),
        "w_fc3": rs.normal(0, 1.0, size=(3 * hidden, n_relations)) * (1.0 / np.sqrt(3 * hidden)),
        "b_fc": rs.normal(0, 0.1, size=(n_relations,)),
        "n_relations": n_relations,
        "window": window,
    }
    return w


def _word_pos_embed(w: dict, ids, pos1, pos2):
    """word ⊕ pos1 ⊕ pos2 input embedding (base_encoder.py input
    construction shared by the CNN/PCNN/CRCNN/LSTM/GRU family)."""
    emb = w["emb"][ids]                                   # (B, L, H)
    p1 = w["pos_emb"][np.clip(pos1, 0, w["pos_emb"].shape[0] - 1)]
    p2 = w["pos_emb"][np.clip(pos2, 0, w["pos_emb"].shape[0] - 1)]
    return np.concatenate([emb, p1, p2], axis=2)          # (B, L, H+2P)


def _conv(w: dict, ids, pos1, pos2):
    x = _word_pos_embed(w, ids, pos1, pos2)
    B, L, D = x.shape
    k = w["window"]
    pad = np.zeros((B, k // 2, D))
    xp = np.concatenate([pad, x, pad], axis=1)
    windows = np.stack([xp[:, i:i + L] for i in range(k)], axis=2)  # (B, L, k, D)
    return windows.reshape(B, L, k * D) @ w["conv"] + w["b_conv"]   # (B, L, H)


def _conv_relu(w: dict, ids, pos1, pos2):
    return np.maximum(_conv(w, ids, pos1, pos2), 0.0)


def forward_cnn_batch(w: dict, ids, pos1, pos2) -> tuple[np.ndarray, np.ndarray]:
    """M4 — CNN forward: conv -> relu -> max-pool over L -> fc."""
    conv = _conv_relu(w, ids, pos1, pos2)
    rep = conv.max(axis=1)                                # (B, H)
    logits = rep @ w["w_fc"] + w["b_fc"]
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    b = np.arange(ids.shape[0])
    pred = p.argmax(axis=1)
    return pred.astype(np.int32), p[b, pred]


def forward_pcnn_batch(w: dict, ids, pos1, pos2, seg_mask) -> tuple[np.ndarray, np.ndarray]:
    """M5 — PCNN forward: conv then 3 masked max-pools (piecewise by the
    K4 segment mask), concat (B, 3H), fc."""
    conv = _conv_relu(w, ids, pos1, pos2)                 # (B, L, H)
    pools = []
    for seg in (1, 2, 3):
        m = (seg_mask == seg)[:, :, None]
        seg_vals = np.where(m, conv, -np.inf)
        pool = seg_vals.max(axis=1)
        pools.append(np.where(np.isfinite(pool), pool, 0.0))
    rep = np.concatenate(pools, axis=1)                   # (B, 3H)
    logits = rep @ w["w_fc3"] + w["b_fc"]
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    b = np.arange(ids.shape[0])
    pred = p.argmax(axis=1)
    return pred.astype(np.int32), p[b, pred]


def _softmax_pred(logits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    logits = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    pred = p.argmax(axis=1)
    return pred.astype(np.int32), p[np.arange(len(pred)), pred]


def forward_crcnn_batch(w: dict, ids, pos1, pos2) -> tuple[np.ndarray, np.ndarray]:
    """M6 — CRCNN forward (crcnn_encoder.py:46-65): identical dataflow
    to M4 but tanh activation after the conv (the reference's default
    activation_function=torch.tanh at crcnn_encoder.py:22) -> max-pool
    over L -> fc. (The reference trains CRCNN with a ranking loss; at
    inference the scoring head shape is the same fc.)"""
    conv = np.tanh(_conv(w, ids, pos1, pos2))             # (B, L, H)
    rep = conv.max(axis=1)                                # (B, H)
    # center on the zero-input response (rep0 = tanh(b_conv), the
    # max over L of a constant sequence) and sharpen — the same
    # untrained-prior calibration build_weights documents.
    rep0 = np.tanh(w["b_conv"])
    offset = rep0 @ w["w_fc"] + w["b_fc"]
    return _softmax_pred((rep @ w["w_fc"] + w["b_fc"] - offset) * 8.0)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def build_rnn_weights(n_relations: int, kind: str = "lstm",
                      vocab_size: int = refsem.VOCAB_SIZE, hidden: int = HIDDEN,
                      pos_dim: int = 5, max_length: int = 128,
                      layers: int = 2, seed: int | None = None) -> dict:
    """M7 weights: word ⊕ pos embeddings through a ``layers``-deep
    recurrent stack (module/nn/lstm.py, gru.py: nn.LSTM/GRU with
    num_layers=2 per lstm_encoder.py:37) then max-pool-over-states + fc
    (lstm_encoder.py:42-59 / gru_encoder.py:42-59 dataflow)."""
    assert kind in ("lstm", "gru")
    if seed is None:
        seed = SEED + (3 if kind == "lstm" else 4)
    rs = np.random.RandomState(seed)
    gates = 4 if kind == "lstm" else 3
    in0 = hidden + 2 * pos_dim
    w = {
        "emb": rs.normal(0, 1.0, size=(vocab_size, hidden)) * (1.0 / np.sqrt(hidden)),
        "pos_emb": rs.normal(0, 1.0, size=(2 * max_length, pos_dim)) * 0.3,
        "w_fc": rs.normal(0, 1.0, size=(hidden, n_relations)) * (1.0 / np.sqrt(hidden)),
        "b_fc": rs.normal(0, 0.1, size=(n_relations,)),
        "n_relations": n_relations,
        "kind": kind,
        "layers": layers,
    }
    in_sz = in0
    for ell in range(layers):
        sc = 1.0 / np.sqrt(max(in_sz, hidden))
        w[f"wx{ell}"] = rs.normal(0, 1.0, size=(in_sz, gates * hidden)) * sc
        w[f"wh{ell}"] = rs.normal(0, 1.0, size=(hidden, gates * hidden)) * (1.0 / np.sqrt(hidden))
        w[f"b{ell}"] = rs.normal(0, 0.1, size=(gates * hidden,))
        in_sz = hidden
    # Untrained-prior calibration (see build_weights): the recurrent
    # stack's bias trajectory gives one class a constant logit lead, so
    # subtract the zero-input run's logits. Row-independent — pure
    # function of the weights.
    x0 = np.zeros((1, max_length, in0))
    for ell in range(layers):
        x0 = _rnn_layer(w, ell, x0, kind)
    rep0 = np.maximum(x0, 0.0).max(axis=1)
    w["logit_offset"] = (rep0 @ w["w_fc"] + w["b_fc"])[0]
    return w


def _rnn_layer(w: dict, ell: int, x: np.ndarray, kind: str) -> np.ndarray:
    """One recurrent layer over (B, L, D) -> (B, L, H). Python loops
    over L only; every step is a whole-batch matmul."""
    B, L, _ = x.shape
    H = w["emb"].shape[1]
    wx, wh, b = w[f"wx{ell}"], w[f"wh{ell}"], w[f"b{ell}"]
    h = np.zeros((B, H))
    xg = x @ wx + b                                        # (B, L, G*H) — hoisted
    out = np.empty((B, L, H))
    if kind == "lstm":
        c = np.zeros((B, H))
        for t in range(L):
            g = xg[:, t] + h @ wh
            i, f, gg, o = g[:, :H], g[:, H:2 * H], g[:, 2 * H:3 * H], g[:, 3 * H:]
            c = _sigmoid(f) * c + _sigmoid(i) * np.tanh(gg)
            h = _sigmoid(o) * np.tanh(c)
            out[:, t] = h
    else:  # gru
        for t in range(L):
            hw = h @ wh
            z = _sigmoid(xg[:, t, :H] + hw[:, :H])
            r = _sigmoid(xg[:, t, H:2 * H] + hw[:, H:2 * H])
            n = np.tanh(xg[:, t, 2 * H:] + r * hw[:, 2 * H:])
            h = (1.0 - z) * n + z * h
            out[:, t] = h
    return out


def forward_rnn_batch(w: dict, ids, pos1, pos2) -> tuple[np.ndarray, np.ndarray]:
    """M7 — LSTM/GRU forward (lstm_encoder.py:42-59,
    gru_encoder.py:42-59): embed ⊕ positions -> 2-layer recurrence ->
    relu (the encoders' default activation_function=F.relu) ->
    max-pool over L -> fc softmax."""
    x = _word_pos_embed(w, ids, pos1, pos2)
    for ell in range(w["layers"]):
        x = _rnn_layer(w, ell, x, w["kind"])
    x = np.maximum(x, 0.0)
    rep = x.max(axis=1)                                    # (B, H)
    logits = (rep @ w["w_fc"] + w["b_fc"] - w["logit_offset"]) * 8.0
    return _softmax_pred(logits)


def load_hf_weights(state_dict: dict, n_relations: int) -> dict:
    """S7 — map a BERTEntityEncoder+SoftmaxNN checkpoint into the
    forward_batch weight layout. The reference builds
    `self.linear = nn.Linear(2H, 2H)` over concatenated entity-start
    states (bert_encoder.py:105-142) and `self.fc = nn.Linear(2H, N)`
    (softmax_nn.py:19,46); this maps those exact parameter names (plus
    the word-embedding table) into the numpy dict, transposing the
    torch (out, in) convention to our (in, out) matmuls.

    ``state_dict`` holds numpy arrays (call .numpy() on torch tensors
    first — no torch import here). The deep transformer stack is NOT
    reproduced by the numpy stand-in (its context mix replaces it); what
    this adapter guarantees is that a real checkpoint's embedding/head
    parameters flow into the same broadcast/scoring plumbing unchanged,
    which is the swap-in contract documented at the top of this module.
    """
    emb = np.asarray(state_dict["sentence_encoder.bert.embeddings.word_embeddings.weight"])
    w_lin = np.asarray(state_dict["sentence_encoder.linear.weight"]).T  # (2H, 2H)
    b_lin = np.asarray(state_dict["sentence_encoder.linear.bias"])
    w_fc = np.asarray(state_dict["fc.weight"]).T                       # (2H, N)
    b_fc = np.asarray(state_dict["fc.bias"])
    hidden = emb.shape[1]
    assert w_lin.shape == (2 * hidden, 2 * hidden), w_lin.shape
    assert w_fc.shape[0] == 2 * hidden and w_fc.shape[1] == n_relations, w_fc.shape
    w = {
        "emb": emb.astype(np.float64),
        "w_lin": w_lin.astype(np.float64),
        "b_lin": b_lin.astype(np.float64),
        "w_fc": w_fc.astype(np.float64),
        "b_fc": b_fc.astype(np.float64),
        "n_relations": n_relations,
        # trained heads need no untrained-prior calibration
        "logit_offset": np.zeros(n_relations),
    }
    return w
