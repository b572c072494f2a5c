"""Stdlib-only H.264/AVC Annex B structural codec: NAL walk + SPS
bit-level parse, and a fixture stream builder.

Narrows the compressed-video plug-point (operators/multimodal.py):
full pixel decode needs CABAC + motion compensation (the documented
ffmpeg plug-point), but the STRUCTURAL layer a 100 TB crawl pipeline
needs — is this a valid stream, what resolution/profile/level, how
many keyframes, where are the random-access points — is pure public
spec (ISO/IEC 14496-10): Annex B start-code scan (§B.1), RBSP
emulation-prevention stripping (§7.3.1), Exp-Golomb entropy coding
(§9.1), and the seq_parameter_set RBSP layout (§7.3.2.1) including
the high-profile chroma/bit-depth branch and frame cropping in
4:2:0 crop units.

Two-sided posture (functions/msgpack.py precedent): ``encode_sps`` /
``build_annexb`` write the bitstream, ``probe_h264`` re-derives every
field from the bits, and the DuckDB oracle recomputes the expected
values arithmetically from the fixture formulas — no shared code
between the three.
"""

from __future__ import annotations

NAL_NON_IDR = 1
NAL_IDR = 5
NAL_SPS = 7
NAL_PPS = 8

# profile_idc values that carry the chroma_format/bit_depth branch
# (§7.3.2.1.1 "if( profile_idc == 100 || ... )").
_HIGH_PROFILES = frozenset((100, 110, 122, 244, 44, 83, 86,
                            118, 128, 138, 139, 134, 135))


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        """Exp-Golomb: leadingZeroBits zeros, then 1, then v+1-2^k."""
        code = v + 1
        n = code.bit_length()
        self.u(2 * n - 1, code)

    def rbsp(self) -> bytes:
        """Trailing stop bit + byte-align (§7.3.2.11), then bytes."""
        bits = self._bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i:i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, b: bytes) -> None:
        self._b, self._pos = b, 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._b[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: any 0x00 0x00 followed
    by 0x00/0x01/0x02/0x03 gets 0x03 injected (§7.4.1)."""
    out = bytearray()
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def unescape_rbsp(data: bytes) -> bytes:
    """Strip emulation_prevention_three_byte."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        byte = data[i]
        if zeros >= 2 and byte == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
        i += 1
    return bytes(out)


def encode_sps(width: int, height: int, profile_idc: int = 66,
               level_idc: int = 30) -> bytes:
    """seq_parameter_set RBSP (escaped, without NAL header) for a
    4:2:0 frame_mbs_only stream of the given even pixel dimensions;
    non-multiple-of-16 sizes produce real frame-cropping fields."""
    if width % 2 or height % 2:
        raise ValueError("4:2:0 needs even dimensions")
    mbs_w = (width + 15) // 16
    mbs_h = (height + 15) // 16
    crop_r = (mbs_w * 16 - width) // 2   # CropUnitX = 2 (4:2:0)
    crop_b = (mbs_h * 16 - height) // 2  # CropUnitY = 2 (frame_mbs_only)
    w = _BitWriter()
    w.u(8, profile_idc)
    w.u(8, 0)                 # constraint flags + reserved_zero_2bits
    w.u(8, level_idc)
    w.ue(0)                   # seq_parameter_set_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)               # chroma_format_idc = 4:2:0
        w.ue(0)               # bit_depth_luma_minus8
        w.ue(0)               # bit_depth_chroma_minus8
        w.u(1, 0)             # qpprime_y_zero_transform_bypass_flag
        w.u(1, 0)             # seq_scaling_matrix_present_flag
    w.ue(0)                   # log2_max_frame_num_minus4
    w.ue(2)                   # pic_order_cnt_type (2: no extra fields)
    w.ue(1)                   # max_num_ref_frames
    w.u(1, 0)                 # gaps_in_frame_num_value_allowed_flag
    w.ue(mbs_w - 1)           # pic_width_in_mbs_minus1
    w.ue(mbs_h - 1)           # pic_height_in_map_units_minus1
    w.u(1, 1)                 # frame_mbs_only_flag
    w.u(1, 1)                 # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)             # frame_cropping_flag
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(1, 0)
    w.u(1, 0)                 # vui_parameters_present_flag
    return escape_rbsp(w.rbsp())


def parse_sps(rbsp_escaped: bytes) -> dict:
    """Escaped SPS RBSP → profile/level/width/height (the §7.4.2.1
    derivation: 16×mbs minus crop offsets in 4:2:0 crop units)."""
    r = _BitReader(unescape_rbsp(rbsp_escaped))
    profile_idc = r.u(8)
    r.u(8)
    level_idc = r.u(8)
    r.ue()                    # seq_parameter_set_id
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)            # separate_colour_plane_flag
        r.ue()
        r.ue()
        r.u(1)
        if r.u(1):            # seq_scaling_matrix_present_flag
            raise ValueError("scaling matrices unsupported")
    r.ue()                    # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.ue()
        r.ue()
        for _ in range(r.ue()):
            r.ue()
    r.ue()                    # max_num_ref_frames
    r.u(1)
    mbs_w = r.ue() + 1
    map_units_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                # mb_adaptive_frame_field_flag
    r.u(1)
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):                # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    frame_h = map_units_h * (2 - frame_mbs_only) * 16
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": mbs_w * 16 - 2 * (crop_l + crop_r),
        "height": frame_h - 2 * (2 - frame_mbs_only) * (crop_t + crop_b),
    }


def _nal(ref_idc: int, nal_type: int, payload: bytes) -> bytes:
    return bytes(((ref_idc << 5) | nal_type,)) + payload


def build_annexb(sps: bytes, pps_payload: bytes,
                 slices: list[tuple[bool, bytes]]) -> bytes:
    """Annex B stream: 4-byte start codes for SPS/PPS (access-unit
    leaders), 3-byte for slices — both legal, and the probe must
    handle both."""
    out = bytearray()
    out += b"\x00\x00\x00\x01" + _nal(3, NAL_SPS, sps)
    out += b"\x00\x00\x00\x01" + _nal(3, NAL_PPS, escape_rbsp(pps_payload))
    for idr, payload in slices:
        nal_type = NAL_IDR if idr else NAL_NON_IDR
        out += b"\x00\x00\x01" + _nal(3 if idr else 2, nal_type,
                                      escape_rbsp(payload))
    return bytes(out)


def probe_h264(b: bytes) -> dict:
    """Annex B scan → NAL type counts + first-SPS stream parameters.

    Start-code scan per §B.1.1 (3- and 4-byte forms); NAL payload ends
    at the next start code or EOF. forbidden_zero_bit must be 0.
    """
    starts: list[int] = []
    i = 0
    n = len(b)
    while i + 3 <= n:
        if b[i] == 0 and b[i + 1] == 0:
            if b[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and b[i + 2] == 0 and b[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    if not starts:
        raise ValueError("no Annex B start code")
    counts = {NAL_SPS: 0, NAL_PPS: 0, NAL_IDR: 0, NAL_NON_IDR: 0}
    sps_meta: dict | None = None
    for idx, start in enumerate(starts):
        end = n
        if idx + 1 < len(starts):
            nxt = starts[idx + 1]
            end = nxt - (4 if b[nxt - 4:nxt] == b"\x00\x00\x00\x01" else 3)
        hdr = b[start]
        if hdr & 0x80:
            raise ValueError(f"forbidden_zero_bit set at byte {start}")
        nal_type = hdr & 0x1F
        if nal_type in counts:
            counts[nal_type] += 1
        if nal_type == NAL_SPS and sps_meta is None:
            sps_meta = parse_sps(b[start + 1:end])
    if sps_meta is None:
        raise ValueError("stream carries no SPS")
    return {
        **sps_meta,
        "n_sps": counts[NAL_SPS],
        "n_pps": counts[NAL_PPS],
        "n_idr": counts[NAL_IDR],
        "n_slices": counts[NAL_IDR] + counts[NAL_NON_IDR],
    }
