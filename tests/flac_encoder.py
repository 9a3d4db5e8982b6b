"""Minimal spec-compliant FLAC *encoder* used as a test fixture.

No FLAC encoder binary or library exists in this environment, so the
decoder tests generate their own streams straight from the format spec:
STREAMINFO, correct CRC-8/CRC-16, UTF-8 frame numbers, and a selectable
mix of subframe types (constant / verbatim / fixed / LPC), Rice
partitioned residuals, wasted bits, and stereo decorrelation modes.
Round-tripping through the vrvq_tpu decoders must recover the exact
input PCM.
"""

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


_FIXED_COEFS = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}


def _best_rice_param(res: np.ndarray) -> int:
    zz = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int(np.sum(zz >> p)) + len(zz) * (p + 1)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p


def _write_residual(bw: BitWriter, res: np.ndarray, block_size: int,
                    order: int, partition_order: int = 0):
    bw.write(0, 2)  # method 0: 4-bit rice
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    assert block_size % nparts == 0
    idx = 0
    for p in range(nparts):
        n = (block_size >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + n]
        idx += n
        param = _best_rice_param(part)
        bw.write(param, 4)
        for v in part:
            zz = int(v) * 2 if v >= 0 else -int(v) * 2 - 1
            bw.write_unary(zz >> param)
            if param:
                bw.write(zz & ((1 << param) - 1), param)


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str,
                    order: int = 2, partition_order: int = 0,
                    wasted: int = 0):
    bw.write(0, 1)  # padding
    if wasted:
        assert np.all(x % (1 << wasted) == 0)
        x = x >> wasted
        eff_bps = bps - wasted
    else:
        eff_bps = bps

    if kind == "constant":
        assert np.all(x == x[0])
        bw.write(0, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        bw.write_signed(int(x[0]), eff_bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in x:
            bw.write_signed(int(v), eff_bps)
    elif kind == "fixed":
        bw.write(8 + order, 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        coefs = _FIXED_COEFS[order]
        res = np.array(
            [
                int(x[i]) - sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
                for i in range(order, len(x))
            ],
            dtype=np.int64,
        )
        _write_residual(bw, res, len(x), order, partition_order)
    elif kind == "lpc":
        coefs = [3, -1][:order] if order <= 2 else [2, -1, 1, 0][:order]
        shift = 1
        prec = 4
        bw.write(32 + (order - 1), 6)
        bw.write(1 if wasted else 0, 1)
        if wasted:
            bw.write_unary(wasted - 1)
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        res = np.array(
            [
                int(x[i])
                - (sum(coefs[j] * int(x[i - 1 - j]) for j in range(order)) >> shift)
                for i in range(order, len(x))
            ],
            dtype=np.int64,
        )
        _write_residual(bw, res, len(x), order, partition_order)
    else:
        raise ValueError(kind)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int,
    bit_depth: int = 16,
    block_size: int = 1024,
    subframe_kind: str = "fixed",
    order: int = 2,
    partition_order: int = 0,
    stereo_mode: str = "independent",  # independent | left_side | right_side | mid_side
    wasted: int = 0,
) -> bytes:
    """pcm: (C, T) int array in [-2^(bps-1), 2^(bps-1))."""
    pcm = np.asarray(pcm, dtype=np.int64)
    nch, total = pcm.shape

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bit_depth - 1, 5)
    si.write(total, 36)
    streaminfo = si.tobytes() + b"\x00" * 16  # md5 unset
    assert len(streaminfo) == 34
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frame_no = 0
    for start in range(0, total, block_size):
        chunk = pcm[:, start : start + block_size]
        bs = chunk.shape[1]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit at end
        bw.write(0, 4)  # sample rate: streaminfo
        if nch == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            ch_code = nch - 1
        bw.write(ch_code, 4)
        bw.write(4, 3)  # sample size: 16-bit
        bw.write(0, 1)  # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bw.tobytes()
        bw2 = BitWriter()
        for b in header + bytes([crc8(header)]):
            bw2.write(b, 8)

        def put(x, bps, kind=subframe_kind):
            _write_subframe(bw2, x, bps, kind, order=order,
                            partition_order=partition_order, wasted=wasted)

        if ch_code == 8:
            left, right = chunk[0], chunk[1]
            put(left, bit_depth)
            put(left - right, bit_depth + 1)
        elif ch_code == 9:
            left, right = chunk[0], chunk[1]
            put(left - right, bit_depth + 1)
            put(right, bit_depth)
        elif ch_code == 10:
            left, right = chunk[0], chunk[1]
            side = left - right
            mid = (left + right) >> 1
            put(mid, bit_depth)
            put(side, bit_depth + 1)
        else:
            for c in range(nch):
                put(chunk[c], bit_depth)

        bw2.align()
        body = bw2.tobytes()
        body += crc16(body).to_bytes(2, "big")
        out += body
        frame_no += 1

    return bytes(out)


def write_flac(path, pcm, sample_rate, **kw):
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, sample_rate, **kw))
