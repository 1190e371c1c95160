"""Naive per-row winnow used by the property cross-check."""


def naive_winnow(toks, k, w, p=(1 << 31) - 1):
    pw, b = [1], 1000003
    for _ in range(k - 1):
        pw.append(pw[-1] * b % p)
    pw = pw[::-1]
    if len(toks) < k + w - 1:
        return set()
    hs = [sum(toks[i + j] * pw[j] for j in range(k)) % p for i in range(len(toks) - k + 1)]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}
