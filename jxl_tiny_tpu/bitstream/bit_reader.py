"""LSB-first bit reader (mirror of the writer; used by the verification decoder)."""
import numpy as np


class BitReader:
    def __init__(self, data: bytes):
        self._data = np.frombuffer(data, np.uint8)
        # 64-bit little-endian words for fast multi-bit reads.
        pad = (-len(data)) % 8 + 8
        padded = np.concatenate([self._data, np.zeros(pad, np.uint8)])
        self._words = padded.view("<u8")
        self._pos = 0  # bit position
        self._total_bits = 8 * len(data)

    @property
    def pos(self) -> int:
        return self._pos

    def bits_remaining(self) -> int:
        return self._total_bits - self._pos

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        assert nbits <= 56
        word_idx = self._pos >> 6
        bit_off = self._pos & 63
        lo = int(self._words[word_idx]) >> bit_off
        if bit_off + nbits > 64:
            lo |= int(self._words[word_idx + 1]) << (64 - bit_off)
        self._pos += nbits
        return lo & ((1 << nbits) - 1)

    def peek(self, nbits: int) -> int:
        p = self._pos
        v = self.read(nbits)
        self._pos = p
        return v

    def skip(self, nbits: int):
        self._pos += nbits

    def zero_pad_to_byte(self):
        rem = (-self._pos) % 8
        if rem:
            v = self.read(rem)
            assert v == 0, "nonzero padding bits"
