"""Host sorting/partitioning primitives used by the BVH builders.

Numpy equivalents of the reference's hand-rolled algorithms
(ref: IDKEngine/Source/Utils/Algorithms.cs): order-preserving float→key
mapping, 11-bit 3-pass LSD radix sort, sorted lower bound, stable partition.
The C++ extension (idkengine_tpu/bvh/cpp) carries the performance-critical
versions; these are the reference/fallback implementations and the test
oracles.
"""
from __future__ import annotations

import numpy as np


def float_to_key(f: np.ndarray) -> np.ndarray:
    """Order-preserving float32 → uint32 (ref: Algorithms.cs:15 FloatToKey).

    Flips sign bit for positives, all bits for negatives, so unsigned
    integer order equals float order."""
    bits = np.ascontiguousarray(f, dtype=np.float32).view(np.uint32)
    mask = np.where(bits >> 31 == 1, np.uint32(0xFFFFFFFF), np.uint32(0x80000000))
    return bits ^ mask


def radix_sort_indices(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of uint32 keys, pass-structured like the reference's
    3x11-bit LSD radix (ref: Algorithms.cs:45-113) — the TEST ORACLE for
    the C++ core's radix (bvh/cpp/bvh.cpp radix_sort_pairs), which carries
    the performance-critical implementation. Numpy has no linear-time
    stable scatter, so each digit pass delegates to a stable argsort;
    callers that just want speed should use argsort_floats."""
    keys = np.asarray(keys, dtype=np.uint32)
    idx = np.arange(keys.shape[0], dtype=np.int64)
    for shift in (0, 11, 22):
        digit = (keys[idx] >> shift) & 0x7FF
        idx = idx[np.argsort(digit, kind="stable")]
    return idx


def argsort_floats(f: np.ndarray) -> np.ndarray:
    """Stable float argsort through the order-preserving key mapping (one
    stable argsort — the fast host path; the C++ core uses its radix)."""
    return np.argsort(float_to_key(f), kind="stable")


def sorted_lower_bound(arr: np.ndarray, value) -> int:
    """First index i with arr[i] >= value (ref: Algorithms.cs SortedLowerBound)."""
    return int(np.searchsorted(arr, value, side="left"))


def stable_partition(arr: np.ndarray, mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Stable partition: elements with mask True first, preserving relative
    order in both groups (ref: Algorithms.cs:276-322). Returns (out, pivot)."""
    true_part = arr[mask]
    return np.concatenate([true_part, arr[~mask]]), int(true_part.shape[0])
