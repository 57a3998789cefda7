"""scipy.signal.find_peaks shim: a faithful (simplified-plateau) port of the
local-maxima → distance-thinning → prominence-filter pipeline, numpy-speed
where it matters. Used only for the BASELINE.md timing run."""
import numpy as np


def _prominence(x, peak):
    n = len(x)
    h = x[peak]
    left_min = h
    i = peak - 1
    while i >= 0 and x[i] <= h:
        left_min = min(left_min, x[i])
        i -= 1
    right_min = h
    i = peak + 1
    while i < n and x[i] <= h:
        right_min = min(right_min, x[i])
        i += 1
    return h - max(left_min, right_min)


def find_peaks(x, distance=None, prominence=None):
    x = np.asarray(x, dtype=float)
    if len(x) < 3:
        return np.array([], dtype=int), {}
    mid = x[1:-1]
    cand = np.flatnonzero((mid > x[:-2]) & (mid >= x[2:])) + 1
    if prominence is not None:
        proms = np.array([_prominence(x, p) for p in cand])
        keep = proms >= prominence
        cand, proms = cand[keep], proms[keep]
    else:
        proms = x[cand]
    if distance is not None and len(cand) > 1:
        order = np.argsort(-proms)
        taken = np.zeros(len(x), dtype=bool)
        chosen = []
        for j in order:
            p = cand[j]
            if not taken[max(0, p - int(distance) + 1): p + int(distance)].any():
                chosen.append(p)
                taken[p] = True
        cand = np.array(sorted(chosen), dtype=int)
    return cand, {}
