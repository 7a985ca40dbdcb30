"""CABAC arithmetic decoder (spec 9.3.3.2) — used for round-trip tests and
the subset validation decoder. Not part of the encode path."""

from __future__ import annotations

from .cabac import RANGE_TAB_LPS, TRANS_IDX_LPS, TRANS_IDX_MPS, ContextSet


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_pos: int = 0):
        self.data = data
        self.pos = bit_pos

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_ue(self) -> int:
        zeros = 0
        while self.read_bit() == 0:
            zeros += 1
        return (1 << zeros) - 1 + (self.read_bits(zeros) if zeros else 0)

    def read_se(self) -> int:
        k = self.read_ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0


class CabacDecoder:
    __slots__ = ("br", "range", "offset")

    def __init__(self, bit_reader: BitReader):
        self.br = bit_reader
        self.range = 510
        self.offset = bit_reader.read_bits(9)

    def decode_bin(self, ctxs: ContextSet, ctx_idx: int) -> int:
        state = int(ctxs.state[ctx_idx])
        mps = int(ctxs.mps[ctx_idx])
        lps = int(RANGE_TAB_LPS[state, (self.range >> 6) & 3])
        self.range -= lps
        if self.offset >= self.range:
            bin_val = 1 - mps
            self.offset -= self.range
            self.range = lps
            if state == 0:
                ctxs.mps[ctx_idx] = 1 - mps
            ctxs.state[ctx_idx] = TRANS_IDX_LPS[state]
        else:
            bin_val = mps
            ctxs.state[ctx_idx] = TRANS_IDX_MPS[state]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.br.read_bit()
        return bin_val

    def decode_bypass(self) -> int:
        self.offset = (self.offset << 1) | self.br.read_bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bins(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.br.read_bit()
        return 0
