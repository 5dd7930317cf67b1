"""Pure-Python ETC1S / BasisLZ (Basis Universal) transcoder.

Fills the role of the reference's libktx/BasisU native transcode path
(ref: Source/Ktx2Texture.cs + ModelLoader.cs:922-1111): KTX2 files with
supercompressionScheme=1 (BasisLZ) carry Huffman-coded ETC1S endpoint /
selector codebooks plus per-mip slice streams. The reference transcodes to
BC4/5/7 for GL; the TPU atlas wants RGBA8, so this decoder goes straight to
RGBA8 (ETC1S -> RGB is exact: base5->8 + ETC1 intensity modifiers).

Format knowledge comes from the public KTX2 specification ("Khronos Texture
Container Format" §BasisLZ Global Data) and the Basis Universal ETC1S
bitstream description. Every stream decoded here is validated by exact bit
consumption (streams end within 8 bits of the payload) and mip-level
cross-consistency (tests/test_basisu.py).

Decoded layout notes (verified against the 76 bundled reference textures):
  - Huffman tables: 14-bit total_used_syms, 5-bit code-length-code count,
    3-bit code lengths in the order {17,18,19,20,0,8,7,9,6,10,5,11,4,12,3,
    13,2,14,1,15,16}; RLE codes 17/18 (zero runs 3+3bits / 11+7bits) and
    19/20 (prev repeats 3+2bits / 7+7bits); canonical codes read MSB-first.
  - Endpoints: four models (three color models selected by the previous
    channel value's range <=9 / <=21 / else, one intensity model), 1-bit
    grayscale flag; values are mod-32 deltas from the previous endpoint.
  - Selectors: 1-bit raw flag (raw = 4 row bytes each), else two legacy
    palette flags then a 256-symbol XOR-delta model with the first selector
    raw. Legacy global/hybrid palettes fall back to mid selectors.
  - Slices: per 4x4 block — endpoint prediction symbols cover 2x2 block
    groups (2 bits per block: 0=raster-previous, 1=above, 2=above-left,
    3=explicit delta vs previous index; symbol 256 = repeat-last with VLC4
    count), selector symbols are literal / history-buffer reference / RLE
    (marker at num_selectors + history_size, count model with VLC7 escape
    at 63), history buffer = 64-entry prefilled approximate-MTF
    (insert-front, use() swaps toward index/2).
"""
from __future__ import annotations

import struct

import numpy as np

from ..log import get_logger

log = get_logger(__name__)

_SORTED_CODELENGTH_ORDER = (17, 18, 19, 20, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
                            3, 13, 2, 14, 1, 15, 16)

ETC1_MODIFIERS = np.array([
    (-8, -2, 2, 8), (-17, -5, 5, 17), (-29, -9, 9, 29), (-42, -13, 13, 42),
    (-60, -18, 18, 60), (-80, -24, 24, 80), (-106, -33, 33, 106),
    (-183, -47, 47, 183),
], np.int32)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def get_bits(self, n: int) -> int:
        pos = self.pos
        b0 = pos >> 3
        chunk = int.from_bytes(self.data[b0:b0 + 4], "little")
        self.pos = pos + n
        return (chunk >> (pos & 7)) & ((1 << n) - 1)

    def peek16(self) -> int:
        pos = self.pos
        b0 = pos >> 3
        chunk = int.from_bytes(self.data[b0:b0 + 4], "little")
        return (chunk >> (pos & 7)) & 0xFFFF

    def get_vlc(self, chunk_bits: int) -> int:
        v = 0
        ofs = 0
        while True:
            s = self.get_bits(chunk_bits + 1)
            v |= (s & ((1 << chunk_bits) - 1)) << ofs
            ofs += chunk_bits
            if not (s >> chunk_bits):
                return v


class Huffman:
    """Canonical Huffman decoder with a 16-bit stream-order lookup table."""

    __slots__ = ("lut_sym", "lut_len")

    def __init__(self, code_sizes):
        max_len = max((c for c in code_sizes if c), default=0)
        assert max_len <= 16, max_len
        bl_count = np.bincount([c for c in code_sizes if c], minlength=max_len + 1)
        next_code = np.zeros(max_len + 2, np.int64)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + int(bl_count[l - 1])) << 1
            next_code[l] = code
        self.lut_sym = np.full(1 << 16, -1, np.int32)
        self.lut_len = np.zeros(1 << 16, np.uint8)
        for sym, L in enumerate(code_sizes):
            if not L:
                continue
            c = int(next_code[L])
            next_code[L] += 1
            # stream carries canonical codes MSB-first; LSB-first bit reads
            # land the first bit in the low position => LUT index is the
            # bit-reversed code with arbitrary high bits
            rev = 0
            for i in range(L):
                rev |= ((c >> (L - 1 - i)) & 1) << i
            idx = rev + (np.arange(1 << (16 - L), dtype=np.int64) << L)
            self.lut_sym[idx] = sym
            self.lut_len[idx] = L

    def decode(self, br: BitReader) -> int:
        x = br.peek16()
        sym = int(self.lut_sym[x])
        if sym < 0:
            raise ValueError("bad huffman code")
        br.pos += int(self.lut_len[x])
        return sym


def read_huffman_table(br: BitReader) -> Huffman | None:
    total_used_syms = br.get_bits(14)
    if total_used_syms == 0:
        return None
    num_cl = br.get_bits(5)
    cl_sizes = [0] * 21
    for i in range(num_cl):
        cl_sizes[_SORTED_CODELENGTH_ORDER[i]] = br.get_bits(3)
    cl_model = Huffman(cl_sizes)
    sizes: list[int] = []
    while len(sizes) < total_used_syms:
        c = cl_model.decode(br)
        if c <= 16:
            sizes.append(c)
        elif c == 17:
            sizes.extend([0] * (br.get_bits(3) + 3))
        elif c == 18:
            sizes.extend([0] * (br.get_bits(7) + 11))
        elif c == 19:
            sizes.extend([sizes[-1]] * (br.get_bits(2) + 3))
        else:
            sizes.extend([sizes[-1]] * (br.get_bits(7) + 7))
    if len(sizes) != total_used_syms:
        raise ValueError("huffman code-length stream overran")
    return Huffman(sizes)


def _check_consumed(br: BitReader, data: bytes, what: str):
    left = len(data) * 8 - br.pos
    if not (0 <= left < 8):
        raise ValueError(f"{what}: stream mis-decoded ({left} bits left)")


# ---------------------------------------------------------------------------
# Container + global data
# ---------------------------------------------------------------------------

_IDENTIFIER = b"\xabKTX 20\xbb\r\n\x1a\n"


def parse_basis_ktx2(data: bytes) -> dict:
    """Parse header + BasisLZ global data of a KTX2 file."""
    if data[:12] != _IDENTIFIER:
        raise ValueError("not a KTX2 file")
    (vk_format, _ts, w, h, _d, _layers, _faces, levels,
     scheme) = struct.unpack_from("<9I", data, 12)
    dfd_off, dfd_len, _k0, _k1 = struct.unpack_from("<4I", data, 48)
    sgd_off, sgd_len = struct.unpack_from("<QQ", data, 64)
    levels = max(levels, 1)
    level_index = []
    off = 80
    for _ in range(levels):
        bo, bl, ubl = struct.unpack_from("<3Q", data, off)
        level_index.append((bo, bl, ubl))
        off += 24
    if scheme != 1:
        raise ValueError(f"not BasisLZ (scheme={scheme})")
    color_model = data[dfd_off + 12] if dfd_len >= 13 else 0
    if color_model != 163:  # KDF_DF_MODEL_ETC1S
        # UASTC (model 166) is deliberately unimplemented: a round-4 scan of
        # every KTX2 the reference ships (76 files across HelmetCompressed/
        # SponzaCompressed/LucyCompressed + engine resources) found ALL of
        # them ETC1S/BasisLZ (scheme 1, model 163) — the reference's libktx
        # UASTC path (Ktx2Texture.cs) is never exercised by its own assets.
        # With no UASTC fixture, encoder, or spec available in this
        # environment, a from-memory implementation of the 19-mode block
        # format would be unverifiable; failing loudly is the honest
        # behaviour. (PARITY.md "KTX2/UASTC" records the decision.)
        raise ValueError(f"unsupported DFD color model {color_model} "
                         "(only ETC1S; UASTC deliberately unimplemented — "
                         "no UASTC asset/spec/encoder exists here to "
                         "validate against; see PARITY.md)")
    sgd = data[sgd_off:sgd_off + sgd_len]
    (ep_count, sel_count, ep_bytes, sel_bytes, tab_bytes,
     _ext_bytes) = struct.unpack_from("<2H4I", sgd, 0)
    off = 20
    image_descs = []
    for _ in range(levels):
        image_descs.append(struct.unpack_from("<5I", sgd, off))
        off += 20
    ep_data = sgd[off:off + ep_bytes]
    off += ep_bytes
    sel_data = sgd[off:off + sel_bytes]
    off += sel_bytes
    tab_data = sgd[off:off + tab_bytes]
    return {
        "width": w, "height": max(h, 1), "levels": levels,
        "level_index": level_index, "image_descs": image_descs,
        "ep_count": ep_count, "sel_count": sel_count,
        "ep_data": ep_data, "sel_data": sel_data, "tab_data": tab_data,
        "data": data,
    }


def decode_endpoints(ep_data: bytes, n: int) -> np.ndarray:
    """(n,4) int32: r5, g5, b5, inten3."""
    br = BitReader(ep_data)
    m0 = read_huffman_table(br)
    m1 = read_huffman_table(br)
    m2 = read_huffman_table(br)
    minten = read_huffman_table(br)
    grayscale = br.get_bits(1)
    prev = [16, 16, 16]
    prev_inten = 0
    out = np.zeros((n, 4), np.int32)
    for i in range(n):
        prev_inten = (prev_inten + minten.decode(br)) & 7
        out[i, 3] = prev_inten
        for c in range(1 if grayscale else 3):
            p = prev[c]
            m = m0 if p <= 9 else (m1 if p <= 21 else m2)
            prev[c] = (p + m.decode(br)) & 31
            out[i, c] = prev[c]
        if grayscale:
            out[i, 1] = out[i, 2] = out[i, 0]
            prev[1] = prev[2] = prev[0]
    _check_consumed(br, ep_data, "endpoint codebook")
    return out


def decode_selectors(sel_data: bytes, n: int) -> np.ndarray:
    """(n,4) uint8 row bytes; each byte packs 4 linear 2-bit selectors
    LSB-first in x."""
    br = BitReader(sel_data)
    rows = np.zeros((n, 4), np.uint8)
    if br.get_bits(1):  # raw
        for i in range(n):
            for j in range(4):
                rows[i, j] = br.get_bits(8)
        _check_consumed(br, sel_data, "selector codebook (raw)")
        return rows
    g = br.get_bits(1)
    hyb = br.get_bits(1)
    if g or hyb:
        # legacy global/hybrid selector palettes — only seen on tiny
        # codebooks (e.g. 4x4 white.ktx2). We fill with MAX selectors
        # (0xFF): exact for flat-extreme textures like white.ktx2, an
        # approximation for anything else (the legacy palette tables are
        # not implemented)
        log.warning("BasisLZ legacy selector palette: approximating %d "
                    "selectors with max values (exact only for flat "
                    "extremes)", n)
        rows[:] = 0xFF
        return rows
    dm = read_huffman_table(br)
    prev = [br.get_bits(8) for _ in range(4)]
    rows[0] = prev
    for i in range(1, n):
        for j in range(4):
            prev[j] ^= dm.decode(br)
            rows[i, j] = prev[j]
    _check_consumed(br, sel_data, "selector codebook")
    return rows


class _MTF:
    """Prefilled approximate move-to-front history buffer."""

    __slots__ = ("values",)

    def __init__(self, size: int):
        self.values = [0] * size

    def add(self, v: int):
        self.values.pop()
        self.values.insert(0, v)

    def use(self, idx: int):
        if idx:
            j = idx // 2
            vals = self.values
            vals[j], vals[idx] = vals[idx], vals[j]


def decode_tables(tab_data: bytes) -> dict:
    br = BitReader(tab_data)
    t = {
        "ep_pred": read_huffman_table(br),
        "delta_ep": read_huffman_table(br),
        "sel": read_huffman_table(br),
        "rle": read_huffman_table(br),
    }
    t["hist_size"] = br.get_bits(13)
    _check_consumed(br, tab_data, "slice tables")
    return t


def decode_slice(payload: bytes, nbx: int, nby: int, n_endpoints: int,
                 n_selectors: int, tables: dict):
    """Decode one ETC1S slice to per-block (endpoint_idx, selector_idx)."""
    ep_pred_m = tables["ep_pred"]
    delta_ep_m = tables["delta_ep"]
    sel_m = tables["sel"]
    rle_m = tables["rle"]
    hist_size = tables["hist_size"]
    br = BitReader(payload)
    ep_out = np.zeros((nby, nbx), np.int32)
    sel_out = np.zeros((nby, nbx), np.int32)
    hist = _MTF(hist_size)
    prev_ep = 0
    rle_count = 0
    rle_sel = 0
    pred_repeat = 0
    last_pred_sym = 0
    cur_bits = 0
    stash = [0] * ((nbx + 1) // 2)
    rle_marker = n_selectors + hist_size
    for by in range(nby):
        even_row = (by & 1) == 0
        for bx in range(nbx):
            # --- endpoint prediction bits
            if (bx & 1) == 0:
                if even_row:
                    if pred_repeat > 0:
                        pred_repeat -= 1
                        cur_bits = last_pred_sym
                    else:
                        cur_bits = ep_pred_m.decode(br)
                        if cur_bits == 256:
                            pred_repeat = br.get_vlc(4) + 2
                            cur_bits = last_pred_sym
                        else:
                            last_pred_sym = cur_bits
                    stash[bx >> 1] = cur_bits >> 4
                else:
                    cur_bits = stash[bx >> 1]
            else:
                cur_bits >>= 2
            pred = cur_bits & 3
            # --- endpoint index
            if pred == 0:
                ep = prev_ep
            elif pred == 1:
                ep = ep_out[by - 1, bx] if by > 0 else 0
            elif pred == 2:
                ep = ep_out[by - 1, bx - 1] if (by > 0 and bx > 0) else 0
            else:
                ep = prev_ep + delta_ep_m.decode(br)
                if ep >= n_endpoints:
                    ep -= n_endpoints
            prev_ep = ep
            ep_out[by, bx] = ep
            # --- selector index
            if rle_count > 0:
                rle_count -= 1
                sel = rle_sel
            else:
                s = sel_m.decode(br)
                if s < n_selectors:
                    sel = s
                    if hist_size:
                        hist.add(s)
                elif s < rle_marker:
                    hidx = s - n_selectors
                    sel = hist.values[hidx]
                    hist.use(hidx)
                else:
                    r = rle_m.decode(br)
                    rle_count = (3 + br.get_vlc(7)) if r == 63 else (3 + r)
                    sel = hist.values[0]
                    rle_count -= 1
                rle_sel = sel
            sel_out[by, bx] = sel
    _check_consumed(br, payload, "slice")
    return ep_out, sel_out


def _reconstruct(ep_idx, sel_idx, endpoints, selectors, lw, lh):
    """Vectorized ETC1S block reconstruction -> (lh, lw, 3) uint8."""
    nby, nbx = ep_idx.shape
    base = ((endpoints[:, :3] << 3) | (endpoints[:, :3] >> 2))  # (E,3)
    mods = ETC1_MODIFIERS[endpoints[:, 3]]  # (E,4)
    e = ep_idx.reshape(-1)
    s = sel_idx.reshape(-1)
    rowb = selectors[s].astype(np.int32)  # (B,4) row bytes
    shifts = 2 * np.arange(4, dtype=np.int32)
    sel2 = (rowb[:, :, None] >> shifts[None, None, :]) & 3  # (B, y, x)
    mod = np.take_along_axis(
        mods[e][:, None, :].repeat(4, axis=1), sel2, axis=2)  # (B,4,4)
    px = base[e][:, None, None, :] + mod[..., None]  # (B,4,4,3)
    px = np.clip(px, 0, 255).astype(np.uint8)
    img = px.reshape(nby, nbx, 4, 4, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nby * 4, nbx * 4, 3)
    return img[:lh, :lw]


def decode_level(parsed: dict, level: int, tables: dict | None = None,
                 endpoints=None, selectors=None) -> np.ndarray:
    """Decode one mip level to (H, W, 4) uint8 (alpha slice honored)."""
    if tables is None:
        tables = decode_tables(parsed["tab_data"])
    if endpoints is None:
        endpoints = decode_endpoints(parsed["ep_data"], parsed["ep_count"])
    if selectors is None:
        selectors = decode_selectors(parsed["sel_data"], parsed["sel_count"])
    _flags, rgb_off, rgb_len, a_off, a_len = parsed["image_descs"][level]
    lw = max(parsed["width"] >> level, 1)
    lh = max(parsed["height"] >> level, 1)
    nbx = (lw + 3) // 4
    nby = (lh + 3) // 4
    data_off = parsed["level_index"][level][0]
    data = parsed["data"]
    payload = data[data_off + rgb_off: data_off + rgb_off + rgb_len]
    ep_idx, sel_idx = decode_slice(
        payload, nbx, nby, parsed["ep_count"], parsed["sel_count"], tables)
    rgb = _reconstruct(ep_idx, sel_idx, endpoints, selectors, lw, lh)
    if a_len:
        pa = data[data_off + a_off: data_off + a_off + a_len]
        aep, asel = decode_slice(
            pa, nbx, nby, parsed["ep_count"], parsed["sel_count"], tables)
        a = _reconstruct(aep, asel, endpoints, selectors, lw, lh)[..., :1]
    else:
        a = np.full((lh, lw, 1), 255, np.uint8)
    return np.concatenate([rgb, a], axis=-1)


def transcode_ktx2(data: bytes, max_size: int = 0) -> np.ndarray | None:
    """Decode a BasisLZ KTX2 to RGBA8. With max_size > 0, decodes the
    smallest mip level still >= max_size on both axes (the atlas resamples
    anyway — decoding 512^2 instead of 2048^2 is ~16x less symbol work)."""
    try:
        parsed = parse_basis_ktx2(data)
    except ValueError as e:
        log.debug("basisu: %s", e)
        return None
    level = 0
    if max_size:
        while (level + 1 < parsed["levels"]
               and max(parsed["width"] >> (level + 1), 1) >= max_size
               and max(parsed["height"] >> (level + 1), 1) >= max_size):
            level += 1
    try:
        return decode_level(parsed, level)
    except Exception as e:
        log.warning("basisu transcode failed: %s", e)
        return None
