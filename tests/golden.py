"""Golden reference implementations, transcribed as plain-Python formulas from
the algorithm descriptions of the reference C++ (lib/utils.cc) for use as test
oracles. Deliberately scalar/naive — the point is an independent formulation
from the vectorized kernels under test."""
from __future__ import annotations

import numpy as np


def golden_scramble(bits, seed):
    state = seed
    out = []
    for b in bits:
        fb = ((state >> 6) ^ (state >> 3)) & 1
        out.append(fb ^ int(b))
        state = ((state << 1) & 0x7E) | fb
    return np.array(out, np.uint8)


def golden_conv_encode(bits):
    def ones(n):
        return bin(n & 0xFF).count("1")

    state = 0
    out = []
    for b in bits:
        state = ((state << 1) & 0x7E) | int(b)
        out.append(ones(state & 0o155) % 2)
        out.append(ones(state & 0o117) % 2)
    return np.array(out, np.uint8)


def golden_puncture_34(bits):
    return np.array([b for i, b in enumerate(bits) if i % 6 not in (3, 4)], np.uint8)


def golden_interleave(bits, n_cbps, n_bpsc, reverse=False):
    s = max(n_bpsc // 2, 1)
    first = [s * (j // s) + (j + int(np.floor(16.0 * j / n_cbps))) % s for j in range(n_cbps)]
    second = [16 * i - (n_cbps - 1) * int(np.floor(16.0 * i / n_cbps)) for i in range(n_cbps)]
    n_sym = len(bits) // n_cbps
    out = np.zeros_like(bits)
    for i in range(n_sym):
        for k in range(n_cbps):
            if reverse:
                out[i * n_cbps + second[first[k]]] = bits[i * n_cbps + k]
            else:
                out[i * n_cbps + k] = bits[i * n_cbps + second[first[k]]]
    return out
