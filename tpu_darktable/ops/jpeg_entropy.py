"""On-device JPEG baseline entropy coding: Huffman + bit packing as XLA.

The reference encodes the *entire* JPEG on the GPU via nvJPEG and returns
only the compressed bitstream (csrc/jpeg_encoder.cu:117-173).  The round-2
TPU port stopped at quantized int16 zigzag coefficients on device and
shipped ~36-48 MB/frame to the host for entropy packing; on a slow
host<->device link that transfer dominates the whole encode.  This module
moves the entropy stage onto the device so only the ~2-6 MB packed stream
crosses the link:

- per-coefficient Huffman emissions (DC size/diff codes, AC run-length
  symbols with folded ZRLs, EOB) are synthesized as fixed-slot left-aligned
  bitstrings (2 x uint32 words + bit length, one slot per coefficient plus
  an EOB slot, empty slots have length 0);
- slots are concatenated by hierarchical doubling: each level concatenates
  adjacent string pairs with a variable bit shift (elementwise) and a
  log-decomposed word shift (selects over statically shifted copies) - no
  gathers, no scatters, XLA-fusable throughout;
- each restart interval is byte-aligned with 1-padding exactly like the
  C++ BitWriter (native/bitpack.cpp:106-113), then intervals are
  word-compacted into one dense stream;
- the host receives the packed words plus per-interval byte counts, applies
  0xFF stuffing, and joins intervals with RSTn markers - a few ms of numpy
  on a few MB.

The resulting body is byte-identical to the native C++ scan
(native/bitpack.cpp: jpeg_encode_baseline_rst) for the same restart
interval, which is how it is tested.

Capacity handling: intermediate doubling levels use exact worst-case
capacities until they exceed the configured per-interval cap; the final
per-interval bit lengths are computed exactly, so any overflow of the cap
is detected and reported for a lossless host-path fallback.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# Worst-case bits for a single slot item (Annex-K tables: up to three folded
# ZRLs at <=12 bits each plus a 16-bit AC code and 10 amplitude bits).
_MAX_ITEM_BITS = 62
# Worst-case bits for one block's full emission stream (DC 27 + 63 AC * 26).
_MAX_BLOCK_BITS = 1665
_SLOTS = 65  # DC + AC positions 1..63 + EOB


# ---------------------------------------------------------------------------
# Left-aligned multi-word bitstrings
#
# A batch of bitstrings is (words: uint32[..., n, W], lens: int32[..., n]).
# Bit i of a string is bit (31 - i % 32) of word i // 32.  All bits at
# positions >= len are zero (required: concatenation ORs strings together).
# ---------------------------------------------------------------------------


def _shift_right_bits(w, s):
    """Shift word array right by s bits (0 <= s < 32), s broadcast over words."""
    s = s[..., None].astype(jnp.uint32)
    pad = [(0, 0)] * (w.ndim - 1) + [(1, 0)]
    prev = jnp.pad(w, pad)[..., :-1]
    hi = jnp.where(s == 0, jnp.uint32(0), prev << (jnp.uint32(32) - s))
    return (w >> s) | hi


def _shift_right_words(w, wo, max_shift: int):
    """Shift word array right by wo whole words (log-decomposed selects)."""
    out = w
    bit = 0
    while (1 << bit) <= max_shift:
        sh = 1 << bit
        if sh < out.shape[-1]:
            pad = [(0, 0)] * (out.ndim - 1) + [(sh, 0)]
            shifted = jnp.pad(out[..., :-sh], pad)
        else:
            shifted = jnp.zeros_like(out)
        out = jnp.where(((wo[..., None] >> bit) & 1) == 1, shifted, out)
        bit += 1
    return out


def _widen(w, out_w: int):
    cur = w.shape[-1]
    if cur >= out_w:
        return w[..., :out_w]
    pad = [(0, 0)] * (w.ndim - 1) + [(0, out_w - cur)]
    return jnp.pad(w, pad)


def _concat_pairs(words, lens, out_w: int):
    """One doubling level: concatenate adjacent string pairs.

    words: (..., n, W) uint32, lens: (..., n) int32.
    Returns ((..., ceil(n/2), out_w), (..., ceil(n/2),)).  Odd n carries the
    last string through unmodified.  Bits that would exceed out_w * 32 are
    silently dropped; lens stay exact so overflow is detectable later.
    """
    n = words.shape[-2]
    odd = n % 2
    n_even = n - odd
    a_w, b_w = words[..., 0:n_even:2, :], words[..., 1:n_even:2, :]
    a_l, b_l = lens[..., 0:n_even:2], lens[..., 1:n_even:2]

    a_wide = _widen(a_w, out_w)
    b_wide = _widen(b_w, out_w)
    s = (a_l & 31).astype(jnp.int32)
    wo = (a_l >> 5).astype(jnp.int32)
    max_wo = min(a_w.shape[-1], out_w)
    b_shift = _shift_right_words(_shift_right_bits(b_wide, s), wo, max_wo)
    out = a_wide | b_shift
    out_l = a_l + b_l

    if odd:
        tail_w = _widen(words[..., n_even:n, :], out_w)
        out = jnp.concatenate([out, tail_w], axis=-2)
        out_l = jnp.concatenate([out_l, lens[..., n_even:n]], axis=-1)
    return out, out_l


def _capacity_schedule(n_items: int, item_bits: int, cap_w: int,
                       block_bound: bool):
    """Per-level output word capacities for doubling n_items -> 1.

    item_bits: exact worst-case bits of one input string.  block_bound
    additionally applies the per-block worst case (valid only when the
    input strings are the per-coefficient emission slots).
    """
    caps = []
    n = n_items
    items_per_string = 1
    while n > 1:
        items_per_string *= 2
        bits = items_per_string * item_bits
        if block_bound:
            bits = min(bits, (items_per_string // _SLOTS + 2) * _MAX_BLOCK_BITS)
        caps.append(min((bits + 31) // 32, cap_w))
        n = (n + 1) // 2
    if caps:
        caps[-1] = cap_w  # final level always at full capacity
    return caps


def _pack_doubling(words, lens, cap_w: int, item_bits: int,
                   block_bound: bool = False):
    """Concatenate all strings along the second-to-last axis down to one."""
    for out_w in _capacity_schedule(
            words.shape[-2], item_bits, cap_w, block_bound):
        words, lens = _concat_pairs(words, lens, out_w)
    return words[..., 0, :], lens[..., 0]


# ---------------------------------------------------------------------------
# Huffman LUT lookup as a fused select tree (no gathers: XLA gathers are
# pathological on this backend - CLAUDE.md).
# ---------------------------------------------------------------------------


def _select_tree(index, table: np.ndarray, n_bits: int):
    """LUT lookup via a binary select tree over the index bits.

    index: int32 array in [0, 2**n_bits); table: (2**n_bits,) int numpy.
    Pure elementwise wheres - fuses into one pass.
    """
    def build(lo: int, bit: int):
        # Constant subtrees stay Python ints so they collapse: a subtree
        # whose table slice is uniform emits NO selects (the AC table has
        # large uniform runs - the full tree would be 255 wheres per call).
        if bit < 0:
            return int(table[lo])
        half = 1 << bit
        left = build(lo, bit - 1)
        right = build(lo + half, bit - 1)
        if isinstance(left, int) and isinstance(right, int) and left == right:
            return left
        return jnp.where((index >> bit) & 1 == 1, right, left)

    out = build(0, n_bits - 1)
    return jnp.int32(out) if isinstance(out, int) else out


# ---------------------------------------------------------------------------
# Emission synthesis
# ---------------------------------------------------------------------------


def _bit_size(v):
    """JPEG magnitude category of int32 v (0 for 0)."""
    a = jnp.abs(v)
    return jnp.where(a > 0, 32 - jax.lax.clz(a), 0).astype(jnp.int32)


def _extra_bits(v, size):
    """Amplitude bits: v if v >= 0 else v - 1, masked to `size` bits."""
    raw = jnp.where(v >= 0, v, v - 1).astype(jnp.int32)
    mask = (jnp.int32(1) << size) - 1
    return (raw & mask).astype(jnp.uint32)


def _left_align(val, length):
    """Left-align a value of `length` exact bits (<= 32) into (hi, lo=0)."""
    sh = (jnp.int32(32) - length).astype(jnp.uint32)
    hi = jnp.where(length > 0, val.astype(jnp.uint32) << sh, jnp.uint32(0))
    # length == 32 -> shift 0, fine; length == 0 handled by where
    return hi


def _huff_numpy_tables(codes: np.ndarray, lens: np.ndarray):
    """Pack (len << 20) | code into one int32 LUT (code <= 16 bits)."""
    return (lens.astype(np.int64) << 20 | codes.astype(np.int64)).astype(np.int32)


def _component_items(blocks, dc_diff, dc_lut: np.ndarray, ac_lut: np.ndarray,
                     zrl_code: int, zrl_len: int, eob_code: int, eob_len: int):
    """Per-block emission slots for one component's blocks.

    blocks: (..., 64) int32 zigzag; dc_diff: (...,) int32 DC differences.
    Returns (hi, lo, len) arrays of shape (..., 65) - slot 0 is DC, slots
    1..63 the AC positions, slot 64 the EOB.
    """
    # --- DC: huff(size) ++ extra ---
    dsize = _bit_size(dc_diff)
    dlut = _select_tree(dsize, dc_lut, 4)
    dcode = (dlut & 0xFFFFF).astype(jnp.uint32)
    dlen = (dlut >> 20).astype(jnp.int32)
    dextra = _extra_bits(dc_diff, dsize)
    dc_val = (dcode << dsize.astype(jnp.uint32)) | dextra
    dc_len = dlen + dsize
    dc_hi = _left_align(dc_val, dc_len)
    dc_lo = jnp.zeros_like(dc_hi)

    # --- AC: run-lengths via cumulative max of last-nonzero index ---
    ac = blocks[..., 1:].astype(jnp.int32)  # (..., 63)
    nz = ac != 0
    idx = jax.lax.broadcasted_iota(jnp.int32, ac.shape, ac.ndim - 1)
    prev = jnp.where(nz, idx, -1)
    prev_max = jax.lax.cummax(prev, axis=ac.ndim - 1)
    pad = [(0, 0)] * (ac.ndim - 1) + [(1, 0)]
    prev_before = jnp.pad(prev_max, pad, constant_values=-1)[..., :-1]
    run = idx - prev_before - 1

    zc = run >> 4          # folded ZRL count, 0..3
    rrem = run & 15
    size = _bit_size(ac)
    sym = (rrem << 4) | size
    alut = _select_tree(sym, ac_lut, 8)
    acode = (alut & 0xFFFFF).astype(jnp.uint32)
    alen = (alut >> 20).astype(jnp.int32)
    base_val = (acode << size.astype(jnp.uint32)) | _extra_bits(ac, size)
    base_len = alen + size
    base_hi = _left_align(base_val, base_len)

    # ZRL prefix: left-aligned constants for 0..3 repetitions
    prefs = []
    for k in range(4):
        bits = 0
        for _ in range(k):
            bits = (bits << zrl_len) | zrl_code
        blen = k * zrl_len
        hi = (bits << (64 - blen) >> 32) & 0xFFFFFFFF if blen else 0
        lo = (bits << (64 - blen)) & 0xFFFFFFFF if blen else 0
        prefs.append((hi, lo, blen))
    p_hi = jnp.uint32(prefs[0][0])
    p_lo = jnp.uint32(prefs[0][1])
    p_len = jnp.int32(prefs[0][2])
    for k in (1, 2, 3):
        m = zc == k
        p_hi = jnp.where(m, jnp.uint32(prefs[k][0]), p_hi)
        p_lo = jnp.where(m, jnp.uint32(prefs[k][1]), p_lo)
        p_len = jnp.where(m, jnp.int32(prefs[k][2]), p_len)

    # item = prefix ++ base (prefix <= 36 bits, base <= 26, total <= 62)
    s = p_len.astype(jnp.uint32)
    b_shift_hi = jnp.where(p_len > 0, base_hi >> s, base_hi)
    b_shift_lo = jnp.where(p_len > 0, base_hi << (jnp.uint32(32) - s),
                           jnp.uint32(0))
    # prefix can exceed 32 bits (2-3 ZRLs): place base across (hi, lo)
    s_lo = (p_len - 32).astype(jnp.uint32)
    over = p_len >= 32
    b_over_lo = jnp.where(
        p_len == 32, base_hi,
        jnp.where(over, base_hi >> s_lo, jnp.uint32(0)),
    )
    ac_hi = p_hi | jnp.where(over, jnp.uint32(0), b_shift_hi)
    ac_lo = p_lo | jnp.where(over, b_over_lo, b_shift_lo)
    ac_len = p_len + base_len
    ac_hi = jnp.where(nz, ac_hi, jnp.uint32(0))
    ac_lo = jnp.where(nz, ac_lo, jnp.uint32(0))
    ac_len = jnp.where(nz, ac_len, 0)

    # --- EOB: emitted iff the last AC coefficient is zero ---
    needs_eob = blocks[..., 63] == 0
    e_hi = jnp.where(needs_eob,
                     jnp.uint32(eob_code << (32 - eob_len)), jnp.uint32(0))
    e_len = jnp.where(needs_eob, jnp.int32(eob_len), jnp.int32(0))
    e_lo = jnp.zeros_like(e_hi)

    hi = jnp.concatenate([dc_hi[..., None], ac_hi, e_hi[..., None]], axis=-1)
    lo = jnp.concatenate([dc_lo[..., None], ac_lo, e_lo[..., None]], axis=-1)
    ln = jnp.concatenate([dc_len[..., None], ac_len, e_len[..., None]], axis=-1)
    return hi, lo, ln


# ---------------------------------------------------------------------------
# Full scan assembly
# ---------------------------------------------------------------------------


def _interleave_to_mcus(comp_blocks, subsampling: int):
    """Per-component (N, 64) blocks -> (n_mcu, bpm, 64) in MCU scan order,
    plus the per-MCU-slot component index (0 = luma, else chroma)."""
    n_comp = len(comp_blocks)
    if n_comp == 1:
        return comp_blocks[0][:, None, :], [0]
    y, cb, cr = comp_blocks
    if subsampling == 1:  # 422: [Y0 Y1 Cb Cr]
        n_mcu = cb.shape[0]
        yy = y.reshape(n_mcu, 2, 64)
        return (
            jnp.concatenate([yy, cb[:, None, :], cr[:, None, :]], axis=1),
            [0, 0, 1, 2],
        )
    n_mcu = y.shape[0]  # 444: [Y Cb Cr]
    return (
        jnp.concatenate(
            [y[:, None, :], cb[:, None, :], cr[:, None, :]], axis=1),
        [0, 1, 2],
    )


def _dc_diffs(mcu_blocks, comp_of_slot, n_iv: int):
    """Per-interval DC differences with per-component prediction chains.

    mcu_blocks: (n_iv, M, bpm, 64) int32.  Returns (n_iv, M, bpm) diffs.
    """
    per_slot = [None] * len(comp_of_slot)
    for comp in sorted(set(comp_of_slot)):
        slots = [i for i, c in enumerate(comp_of_slot) if c == comp]
        # A component's slots are consecutive in the MCU layout, so this is
        # a static slice (XLA gathers are pathological here - CLAUDE.md).
        assert slots == list(range(slots[0], slots[-1] + 1)), slots
        dc = mcu_blocks[..., slots[0] : slots[-1] + 1, 0]  # (n_iv, M, k)
        flat = dc.reshape(n_iv, -1)                       # chain order
        prev = jnp.pad(flat, ((0, 0), (1, 0)))[:, :-1]
        d = (flat - prev).reshape(dc.shape)
        for j, sl in enumerate(slots):
            per_slot[sl] = d[..., j]
    return jnp.stack(per_slot, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=('subsampling', 'restart_interval', 'cap_words'))
def _entropy_pack_device(comp_blocks, subsampling: int,
                         restart_interval: int, cap_words: int):
    """Device-side scan: blocks -> (stream words, per-interval byte counts,
    total words, overflow flag).

    comp_blocks: tuple of (N, 64) int arrays (device).  restart_interval in
    MCUs (> 0); the stream is n_iv independent byte-aligned segments.
    cap_words: per-interval packed capacity in uint32 words.
    """
    from .jpeg import _HUFF  # canonical Annex-K tables

    mcus, comp_of_slot = _interleave_to_mcus(
        [cb.astype(jnp.int32) for cb in comp_blocks], subsampling)
    n_mcu, bpm = mcus.shape[0], mcus.shape[1]
    ri = restart_interval
    n_iv = -(-n_mcu // ri)
    pad_mcu = n_iv * ri - n_mcu
    if pad_mcu:
        mcus = jnp.pad(mcus, ((0, pad_mcu), (0, 0), (0, 0)))
    mcus = mcus.reshape(n_iv, ri, bpm, 64)

    dc_diff = _dc_diffs(mcus, comp_of_slot, n_iv)

    # Emission slots per component table (luma slots vs chroma slots are
    # static slices of the MCU axis, so each gets its own select tree).
    luts = {}
    for kind in ('dc', 'ac'):
        for tid in (0, 1):
            c, l = _HUFF[(kind, tid)]
            luts[(kind, tid)] = _huff_numpy_tables(c, l)

    his, los, lns = [], [], []
    for slot, comp in enumerate(comp_of_slot):
        tid = 0 if comp == 0 else 1
        ac_c, ac_l = _HUFF[('ac', tid)]
        hi, lo, ln = _component_items(
            mcus[:, :, slot, :], dc_diff[:, :, slot],
            luts[('dc', tid)][:16], luts[('ac', tid)],
            zrl_code=int(ac_c[0xF0]), zrl_len=int(ac_l[0xF0]),
            eob_code=int(ac_c[0x00]), eob_len=int(ac_l[0x00]),
        )
        his.append(hi)
        los.append(lo)
        lns.append(ln)
    hi = jnp.stack(his, axis=2)   # (n_iv, ri, bpm, 65)
    lo = jnp.stack(los, axis=2)
    ln = jnp.stack(lns, axis=2)

    if pad_mcu:  # emissions of padding MCUs must vanish
        mcu_idx = jax.lax.broadcasted_iota(jnp.int32, (n_iv, ri), 1) \
            + jnp.arange(n_iv, dtype=jnp.int32)[:, None] * ri
        valid = (mcu_idx < n_mcu)[..., None, None]
        hi = jnp.where(valid, hi, jnp.uint32(0))
        lo = jnp.where(valid, lo, jnp.uint32(0))
        ln = jnp.where(valid, ln, 0)

    n_items = ri * bpm * _SLOTS
    words = jnp.stack([hi, lo], axis=-1).reshape(n_iv, n_items, 2)
    lens = ln.reshape(n_iv, n_items)

    iv_words, iv_bits = _pack_doubling(
        words, lens, cap_words, _MAX_ITEM_BITS, block_bound=True)

    # Byte-align each interval with 1-padding (BitWriter.finish semantics).
    pad_bits = (-iv_bits) % 8
    pad_hi = jnp.where(
        pad_bits > 0,
        (jnp.uint32(0xFF) << jnp.uint32(24)) &
        ~(jnp.uint32(0xFFFFFFFF) >> pad_bits.astype(jnp.uint32)),
        jnp.uint32(0),
    )
    pad_str = jnp.concatenate(
        [pad_hi[:, None],
         jnp.zeros((n_iv, cap_words - 1), jnp.uint32)], axis=1)
    stacked = jnp.stack([iv_words, pad_str], axis=1)      # (n_iv, 2, cap)
    lens2 = jnp.stack([iv_bits, pad_bits], axis=1)
    iv_words, iv_bits_padded = _concat_pairs(stacked, lens2, cap_words)
    iv_words = iv_words[:, 0, :]
    iv_bits_padded = iv_bits_padded[:, 0]

    overflow = jnp.any(iv_bits_padded > cap_words * 32)
    iv_bytes = iv_bits_padded // 8

    # Word-compact the intervals into one dense stream (word-granular
    # concatenation: lengths rounded up to whole words, so the bit shift in
    # _concat_pairs is always zero and only the word-shift selects run).
    iv_wlen = ((iv_bytes + 3) // 4) * 32                  # bits, word multiple
    total_cap = n_iv * cap_words
    stream, total_bits = _pack_doubling(
        iv_words[None], iv_wlen[None], total_cap, cap_words * 32)
    return stream[0], iv_bytes, total_bits[0] // 32, overflow


def _stuff_bytes(seg: np.ndarray) -> np.ndarray:
    """0xFF -> 0xFF 0x00 stuffing (vectorized)."""
    is_ff = seg == 0xFF
    if not is_ff.any():
        return seg
    reps = np.where(is_ff, 2, 1)
    out = np.zeros(int(reps.sum()), dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(reps)[:-1]))
    out[pos] = seg
    return out


def entropy_encode_device_dispatch(comp_blocks, subsampling: int,
                                   restart_interval: int,
                                   cap_bytes_per_interval: int | None = None):
    """Dispatch the on-device entropy scan; return pending device handles.

    The returned dict holds jax arrays whose computation is enqueued but not
    synchronized - pass it to :func:`entropy_encode_device_finalize` to do
    the host transfer and byte finalization.  Splitting the two lets a
    streaming caller overlap this frame's stream readback with the next
    batch's device compute (the double-buffered readback the reference gets
    from nvJPEG's on-stream encode, jpeg_encoder.cu:117-173).

    comp_blocks: per-component (N, 64) zigzag coefficient arrays (device or
    host; device inputs avoid the coefficient transfer entirely).
    restart_interval: MCUs per interval (> 0), or 0 for a single segment.
    """
    n_mcu = (comp_blocks[1].shape[0]
             if (subsampling == 1 and len(comp_blocks) == 3)
             else comp_blocks[0].shape[0])
    ri = int(restart_interval) if restart_interval > 0 else n_mcu
    n_iv = -(-n_mcu // ri)
    bpm = 4 if (subsampling == 1 and len(comp_blocks) == 3) else \
        (3 if len(comp_blocks) == 3 else 1)
    if cap_bytes_per_interval is None:
        # ~6x the long-run typical rate at quality <= 95; overflow falls
        # back losslessly, so this is a performance knob, not a correctness
        # bound.
        cap_bytes_per_interval = max(4096, ri * bpm * 40)
    cap_words = -(-int(cap_bytes_per_interval) // 4)

    stream, iv_bytes, total_words, overflow = _entropy_pack_device(
        tuple(jnp.asarray(cb) for cb in comp_blocks),
        subsampling, ri, cap_words)
    return {'stream': stream, 'iv_bytes': iv_bytes,
            'total_words': total_words, 'overflow': overflow, 'n_iv': n_iv}


def entropy_encode_device_finalize(pending):
    """Host side of the device entropy scan: transfer the packed words and
    assemble the scan body (stuffing + RSTn markers).  Returns the body
    bytes (numpy uint8) or None if the device capacity overflowed (caller
    falls back to the host path)."""
    iv_bytes = np.asarray(pending['iv_bytes'])
    if bool(np.asarray(pending['overflow'])):
        return None
    n_iv = pending['n_iv']
    used = int(np.asarray(pending['total_words']))
    words = np.asarray(pending['stream'][:used])   # the only bulk transfer
    raw = words.astype('>u4').tobytes()
    raw = np.frombuffer(raw, dtype=np.uint8)

    parts = []
    off_words = 0
    for i in range(n_iv):
        nb = int(iv_bytes[i])
        seg = raw[off_words * 4: off_words * 4 + nb]
        parts.append(_stuff_bytes(seg))
        if i + 1 < n_iv:
            parts.append(np.frombuffer(
                bytes([0xFF, 0xD0 + (i % 8)]), dtype=np.uint8))
        off_words += (nb + 3) // 4
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)


def entropy_encode_device(comp_blocks, subsampling: int,
                          restart_interval: int,
                          cap_bytes_per_interval: int | None = None):
    """Full baseline entropy scan with the bit packing on device
    (synchronous dispatch + finalize; see the _dispatch/_finalize pair for
    the overlapped streaming form).  Returns the scan body bytes (numpy
    uint8, stuffed, with RSTn markers between intervals) or None if the
    device capacity overflowed (caller falls back to the host path)."""
    return entropy_encode_device_finalize(entropy_encode_device_dispatch(
        comp_blocks, subsampling, restart_interval, cap_bytes_per_interval))


__all__ = ['entropy_encode_device', 'entropy_encode_device_dispatch',
           'entropy_encode_device_finalize']
