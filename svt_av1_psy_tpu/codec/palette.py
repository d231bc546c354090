"""Palette coding (screen content): color selection, color coding, and the
color-index-map tokenization.

Behavior references: palette.c:106 (index_color_cache), :153
(get_palette_cache_y merge), :380 (k-means candidate ladder), :505 +
cabac_context_model.c:2458 (color-index context + index remap),
entropy_coding.c:4166 (delta_encode_palette_colors), :4202 (write_uniform),
:4242 (pack_map_tokens), :4254 (write_palette_mode_info). The selection here
is vectorized numpy (exact palette for <=8 distinct values, else 1-D Lloyd
k-means); the syntax below matches the spec bit-for-bit.
"""

from __future__ import annotations

import numpy as np

PALETTE_MIN_SIZE = 2
PALETTE_MAX_SIZE = 8

# hash -> context (cabac_context_model.c:2454)
_CTX_LOOKUP = [-1, -1, 0, -1, -1, 4, 3, 2, 1]


def allow_palette(allow_sct: bool, W: int, H: int) -> bool:
    """entropy_coding.c:4139 (block 8x8..64x64, screen tools on)."""
    return bool(allow_sct) and W <= 64 and H <= 64 and W >= 8 and H >= 8


def bsize_ctx(W: int, H: int) -> int:
    """num_pels_log2 - num_pels_log2(8x8)."""
    return (W * H).bit_length() - 1 - 6


# ------------------------------------------------------------- selection

def select_palette(block: np.ndarray, bd: int = 8, max_itr: int = 8):
    """(colors, idx_map, sse) for the best palette of the block, or None.
    Exact palette when the block has <= 8 distinct values (the screen
    content case); otherwise one k-means run at n=8 (palette.c:397)."""
    flat = block.reshape(-1).astype(np.int32)
    uniq = np.unique(flat)
    if uniq.size < PALETTE_MIN_SIZE:
        return None
    if uniq.size <= PALETTE_MAX_SIZE:
        colors = uniq
        idx = np.searchsorted(colors, flat)
        return colors.astype(np.uint16), idx.astype(np.uint8).reshape(block.shape), 0
    lb, ub = int(flat.min()), int(flat.max())
    n = PALETTE_MAX_SIZE
    cents = np.array([lb + (2 * i + 1) * (ub - lb) / n / 2 for i in range(n)])
    for _ in range(max_itr):
        idx = np.argmin(np.abs(flat[:, None] - cents[None, :]), axis=1)
        sums = np.bincount(idx, weights=flat, minlength=n)
        cnts = np.bincount(idx, minlength=n)
        newc = np.where(cnts > 0, sums / np.maximum(cnts, 1), cents)
        if np.allclose(newc, cents):
            cents = newc
            break
        cents = newc
    colors = np.unique(np.clip(np.round(cents), 0, (1 << bd) - 1).astype(np.int32))
    if colors.size < PALETTE_MIN_SIZE:
        return None
    idx = np.argmin(np.abs(flat[:, None] - colors[None, :]), axis=1)
    sse = int(((flat - colors[idx]) ** 2).sum())
    return colors.astype(np.uint16), idx.astype(np.uint8).reshape(block.shape), sse


# ------------------------------------------------------------------ cache

def palette_cache(above_colors, left_colors):
    """Merge-sort the neighbor palettes into the color cache
    (svt_get_palette_cache_y, palette.c:153)."""
    cache = []

    def add(v):
        if not cache or cache[-1] != v:
            cache.append(v)

    a = list(above_colors) if above_colors is not None else []
    l = list(left_colors) if left_colors is not None else []
    ai = li = 0
    while ai < len(a) and li < len(l):
        va, vl = a[ai], l[li]
        if vl < va:
            add(vl)
            li += 1
        else:
            add(va)
            ai += 1
            if vl == va:
                li += 1
    while ai < len(a):
        add(a[ai])
        ai += 1
    while li < len(l):
        add(l[li])
        li += 1
    return cache


def index_color_cache(cache, colors):
    """(found_flags per cache entry, out-of-cache colors) — palette.c:106."""
    colors = [int(c) for c in colors]
    if not cache:
        return [], list(colors)
    found = [0] * len(cache)
    in_cache = [False] * len(colors)
    n_in = 0
    for i, cv in enumerate(cache):
        if n_in >= len(colors):
            break
        for j, c in enumerate(colors):
            if not in_cache[j] and c == cv:
                in_cache[j] = True
                found[i] = 1
                n_in += 1
                break
    out = [c for j, c in enumerate(colors) if not in_cache[j]]
    return found, out


# ------------------------------------------------------------------ syntax

def write_uniform(enc, n: int, v: int):
    """Truncated-binary literal (entropy_coding.c:4203)."""
    l = n.bit_length() if n > 0 else 0
    m = (1 << l) - n
    if l == 0:
        return
    if v < m:
        enc.encode_literal(v, l - 1)
    else:
        enc.encode_literal(m + ((v - m) >> 1), l - 1)
        enc.encode_literal((v - m) & 1, 1)


def write_palette_colors_y(enc, cache, colors, bd: int):
    """Cache reuse bits + delta-coded new colors (entropy_coding.c:4224)."""
    found, out = index_color_cache(cache, colors)
    n_in = 0
    for i, f in enumerate(found):
        if n_in >= len(colors):
            break
        enc.encode_literal(f, 1)
        n_in += f
    _delta_encode(enc, out, bd, 1)


def _delta_encode(enc, colors, bd: int, min_val: int):
    """entropy_coding.c:4166 (first literal, shrinking-width deltas)."""
    num = len(colors)
    if num <= 0:
        return
    enc.encode_literal(int(colors[0]), bd)
    if num == 1:
        return
    deltas = [int(colors[i]) - int(colors[i - 1]) for i in range(1, num)]
    max_delta = max(deltas)
    min_bits = bd - 3
    bits = max(max(max_delta + 1 - min_val, 0).bit_length(), min_bits)
    rng = (1 << bd) - int(colors[0]) - min_val
    enc.encode_literal(bits - min_bits, 2)
    for d in deltas:
        enc.encode_literal(d - min_val, bits)
        rng -= d
        bits = min(bits, max(rng, 0).bit_length())


def color_index_ctx(idx_map: np.ndarray, r: int, c: int):
    """(ctx, remapped_index) for map position (r, c)
    (svt_aom_get_palette_color_index_context_optimized)."""
    nb = [int(idx_map[r, c - 1]) if c > 0 else -1,
          int(idx_map[r - 1, c]) if r > 0 else -1,
          int(idx_map[r - 1, c - 1]) if (r > 0 and c > 0) else -1]
    scores = [2, 2, 1]
    if nb[0] == nb[1]:
        scores[0] += scores[1]
        nb[1] = -1
        if nb[0] == nb[2]:
            scores[0] += scores[2]
            nb[2] = -1
    elif nb[0] == nb[2]:
        scores[0] += scores[2]
        nb[2] = -1
    elif nb[1] == nb[2]:
        scores[1] += scores[2]
        nb[2] = -1
    color_rank, score_rank = [-1, -1, -1], [0, 0, 0]
    nv = 0
    for i in range(3):
        if nb[i] != -1:
            score_rank[nv] = scores[i]
            color_rank[nv] = nb[i]
            nv += 1
    if (score_rank[0] < score_rank[1]
            or (score_rank[0] == score_rank[1] and color_rank[0] > color_rank[1])):
        score_rank[0], score_rank[1] = score_rank[1], score_rank[0]
        color_rank[0], color_rank[1] = color_rank[1], color_rank[0]
    if score_rank[0] < score_rank[2]:
        score_rank[0], score_rank[2] = score_rank[2], score_rank[0]
        color_rank[0], color_rank[2] = color_rank[2], color_rank[0]
    if score_rank[1] < score_rank[2]:
        score_rank[1], score_rank[2] = score_rank[2], score_rank[1]
        color_rank[1], color_rank[2] = color_rank[2], color_rank[1]
    cur = int(idx_map[r, c])
    new_idx = cur
    same = -1
    for i in range(3):
        if color_rank[i] > cur:
            new_idx += 1
        elif color_rank[i] == cur:
            same = i
    if same != -1:
        new_idx = same
    h = score_rank[0] * 1 + score_rank[1] * 2 + score_rank[2] * 2
    return _CTX_LOOKUP[h], new_idx


def write_color_map(fc, enc, idx_map: np.ndarray, n: int):
    """First index as write_uniform, the rest in diagonal wavefront order
    with remapped indices (pack_map_tokens + cost_and_tokenize_map)."""
    rows, cols = idx_map.shape
    write_uniform(enc, n, int(idx_map[0, 0]))
    size_idx = n - PALETTE_MIN_SIZE
    for k in range(1, rows + cols - 1):
        for j in range(min(k, cols - 1), max(0, k - rows + 1) - 1, -1):
            i = k - j
            ctx, new_idx = color_index_ctx(idx_map, i, j)
            fc.write(enc, "palette_y_color_index", (size_idx, ctx), new_idx, n)


def map_rate_estimate(idx_map: np.ndarray, n: int) -> float:
    """Decision-time bits estimate for the index map: empirical symbol
    entropy (the reference uses trained per-context costs; an entropy
    bound is adequate for the accept/reject decision)."""
    counts = np.bincount(idx_map.reshape(-1), minlength=n).astype(np.float64)
    p = counts / max(counts.sum(), 1)
    ent = -(p[p > 0] * np.log2(p[p > 0])).sum()
    return float(ent * idx_map.size + n.bit_length())
