#!/usr/bin/env python3
"""Generate golden indicator values for the Scala TA kernels.

Independent array-based transcription of the TA-Lib algorithms (EMA/MACD,
Wilder ATR and ADX/DI, Parabolic SAR, T3) from their published C sources —
deliberately a different implementation shape (whole-array, forward loops)
than the streaming Scala kernels, so transcription mistakes surface as
disagreements. Applies the reference pipeline's pandas fill collapses
(candle_to_calcs.py:381-452) and writes a CSV consumed by TaGoldenSpec.

No talib/scipy in this environment; numpy only.
"""
import numpy as np

N = 500
PERIOD_ATR = 14
rng = np.random.default_rng(20260812)


def gen_ohlc(n):
    close = 100 + np.cumsum(rng.normal(0, 0.5, n))
    close = np.round(close, 2)
    spread = np.abs(rng.normal(0.3, 0.2, n))
    high = np.round(close + spread, 2)
    low = np.round(close - np.abs(rng.normal(0.3, 0.2, n)), 2)
    opn = np.round(low + (high - low) * rng.random(n), 2)
    high = np.maximum.reduce([high, low, opn, close])
    low = np.minimum.reduce([low, opn, close])
    return opn, high, low, close


def ema_talib(x, period):
    """TA_INT_EMA: SMA seed, then e += k*(v - e). NaN before seed."""
    n = len(x)
    out = np.full(n, np.nan)
    if n < period:
        return out
    e = np.mean(x[:period])
    out[period - 1] = e
    k = 2.0 / (period + 1.0)
    for i in range(period, n):
        e = ((x[i] - e) * k) + e
        out[i] = e
    return out


def macd_talib(x, fast=12, slow=26, signal=9):
    """TA_INT_MACD: both EMAs emit from index slow-1 (fast seeded on the
    `fast` values ending there); signal EMA runs over the macd line; all
    outputs NaN before slow+signal-2."""
    n = len(x)
    macd = np.full(n, np.nan)
    sig = np.full(n, np.nan)
    hist = np.full(n, np.nan)
    if n < slow + signal - 1:
        return macd, sig, hist
    slow_e = ema_talib(x, slow)
    fast_e = np.full(n, np.nan)
    # fast EMA seeded at index slow-1 with SMA(x[slow-fast .. slow-1])
    e = np.mean(x[slow - fast:slow])
    fast_e[slow - 1] = e
    k = 2.0 / (fast + 1.0)
    for i in range(slow, n):
        e = ((x[i] - e) * k) + e
        fast_e[i] = e
    line = fast_e - slow_e
    sig_full = ema_talib(line[slow - 1:], signal)
    first = slow + signal - 2
    macd[first:] = line[first:]
    sig[first:] = sig_full[signal - 1:]
    hist = macd - sig
    return macd, sig, hist


def true_range(h, l, pc):
    return max(h - l, abs(h - pc), abs(l - pc))


def atr_talib(h, l, c, period=14):
    n = len(c)
    out = np.full(n, np.nan)
    if n <= period:
        return out
    trs = [true_range(h[i], l[i], c[i - 1]) for i in range(1, period + 1)]
    a = sum(trs) / period
    out[period] = a
    for i in range(period + 1, n):
        a = (a * (period - 1) + true_range(h[i], l[i], c[i - 1])) / period
        out[i] = a
    return out


def adx_talib(h, l, c, period=14):
    n = len(c)
    adx = np.full(n, np.nan)
    dip = np.full(n, np.nan)
    dim = np.full(n, np.nan)
    if n < period + 1:
        return adx, dip, dim
    sm_p = sm_m = sm_tr = 0.0
    for i in range(1, period):
        diff_p = h[i] - h[i - 1]
        diff_m = l[i - 1] - l[i]
        if diff_m > 0 and diff_p < diff_m:
            sm_m += diff_m
        elif diff_p > 0 and diff_p > diff_m:
            sm_p += diff_p
        sm_tr += true_range(h[i], l[i], c[i - 1])
    dx_sum, dx_n, a = 0.0, 0, np.nan
    for i in range(period, n):
        diff_p = h[i] - h[i - 1]
        diff_m = l[i - 1] - l[i]
        sm_m -= sm_m / period
        sm_p -= sm_p / period
        if diff_m > 0 and diff_p < diff_m:
            sm_m += diff_m
        elif diff_p > 0 and diff_p > diff_m:
            sm_p += diff_p
        sm_tr = sm_tr - sm_tr / period + true_range(h[i], l[i], c[i - 1])
        if sm_tr != 0.0:
            dim[i] = 100.0 * (sm_m / sm_tr)
            dip[i] = 100.0 * (sm_p / sm_tr)
            s = dip[i] + dim[i]
            if dx_n < period:
                if s != 0.0:
                    dx_sum += 100.0 * abs(dip[i] - dim[i]) / s
                dx_n += 1
                if dx_n == period:
                    a = dx_sum / period
                    adx[i] = a
            elif s != 0.0:
                a = (a * (period - 1) + 100.0 * abs(dip[i] - dim[i]) / s) / period
                adx[i] = a
            else:
                adx[i] = a
        else:
            dim[i] = 0.0
            dip[i] = 0.0
            adx[i] = a
    return adx, dip, dim


def sar_talib(h, l, af_init=0.02, af_max=0.2):
    n = len(h)
    out = np.full(n, np.nan)
    if n < 2:
        return out
    diff_m = l[0] - l[1]
    diff_p = h[1] - h[0]
    is_long = not (diff_m > 0 and diff_p < diff_m)
    af = af_init
    if is_long:
        ep, sar = h[1], l[0]
    else:
        ep, sar = l[1], h[0]
    prev_h, prev_l = h[0], l[0]
    for i in range(1, n):
        nh, nl = h[i], l[i]
        if is_long:
            if nl <= sar:
                is_long = False
                sar = max(ep, prev_h, nh)
                out[i] = sar
                af, ep = af_init, nl
                sar = sar + af * (ep - sar)
                sar = max(sar, prev_h, nh)
            else:
                out[i] = sar
                if nh > ep:
                    ep = nh
                    af = min(af + af_init, af_max)
                sar = sar + af * (ep - sar)
                sar = min(sar, prev_l, nl)
        else:
            if nh >= sar:
                is_long = True
                sar = min(ep, prev_l, nl)
                out[i] = sar
                af, ep = af_init, nh
                sar = sar + af * (ep - sar)
                sar = min(sar, prev_l, nl)
            else:
                out[i] = sar
                if nl < ep:
                    ep = nl
                    af = min(af + af_init, af_max)
                sar = sar + af * (ep - sar)
                sar = max(sar, prev_h, nh)
        prev_h, prev_l = nh, nl
    return out


def t3_talib(x, period=60, v=0.7):
    n = len(x)
    out = np.full(n, np.nan)
    lookback = 6 * (period - 1)
    if n <= lookback:
        return out
    k = 2.0 / (period + 1.0)
    omk = 1.0 - k
    today = 0
    tmp = 0.0
    for _ in range(period):
        tmp += x[today]
        today += 1
    e1 = tmp / period
    tmp = e1
    for _ in range(period - 1):
        e1 = k * x[today] + omk * e1
        tmp += e1
        today += 1
    e2 = tmp / period
    tmp = e2
    for _ in range(period - 1):
        e1 = k * x[today] + omk * e1
        e2 = k * e1 + omk * e2
        tmp += e2
        today += 1
    e3 = tmp / period
    tmp = e3
    for _ in range(period - 1):
        e1 = k * x[today] + omk * e1
        e2 = k * e1 + omk * e2
        e3 = k * e2 + omk * e3
        tmp += e3
        today += 1
    e4 = tmp / period
    tmp = e4
    for _ in range(period - 1):
        e1 = k * x[today] + omk * e1
        e2 = k * e1 + omk * e2
        e3 = k * e2 + omk * e3
        e4 = k * e3 + omk * e4
        tmp += e4
        today += 1
    e5 = tmp / period
    tmp = e5
    for _ in range(period - 1):
        e1 = k * x[today] + omk * e1
        e2 = k * e1 + omk * e2
        e3 = k * e2 + omk * e3
        e4 = k * e3 + omk * e4
        e5 = k * e4 + omk * e5
        tmp += e5
        today += 1
    e6 = tmp / period
    c1 = -(v ** 3)
    c2 = 3 * v ** 2 + 3 * v ** 3
    c3 = -6 * v ** 2 - 3 * v - 3 * v ** 3
    c4 = 1 + 3 * v + v ** 3 + 3 * v ** 2
    out[today - 1] = c1 * e6 + c2 * e5 + c3 * e4 + c4 * e3
    for i in range(today, n):
        e1 = k * x[i] + omk * e1
        e2 = k * e1 + omk * e2
        e3 = k * e2 + omk * e3
        e4 = k * e3 + omk * e4
        e5 = k * e4 + omk * e5
        e6 = k * e5 + omk * e6
        out[i] = c1 * e6 + c2 * e5 + c3 * e4 + c4 * e3
    return out


def rolling_mean_full(x, period):
    """pandas rolling(period).mean() with min_periods=period, simple sums."""
    n = len(x)
    out = np.full(n, np.nan)
    for i in range(period - 1, n):
        out[i] = np.mean(x[i - period + 1:i + 1])
    return out


def main():
    opn, high, low, close = gen_ohlc(N)
    z = np.nan_to_num

    typical = (high + low + close) / 3.0
    adx, dip, dim = adx_talib(high, low, close)
    adx, dip, dim = z(adx), z(dip), z(dim)
    di_diff = dip - dim
    macd, sig, hist = macd_talib(close)
    macd, sig, hist = z(macd), z(sig), z(hist)
    psar_raw = sar_talib(high, low)
    psar = np.where(np.isnan(psar_raw), close, psar_raw)
    psar_trend = (close > psar).astype(int)
    psar_reversal = np.abs(np.diff(psar_trend, prepend=psar_trend[0])).astype(float)
    psar_reversal[0] = 0.0
    atr = z(atr_talib(high, low, close))
    atr_norm = atr / close
    atr_change = np.diff(atr, prepend=atr[0])
    atr_change[0] = 0.0
    hv_rhs = np.nan_to_num(rolling_mean_full(atr_norm, 14))
    high_vol = (atr_norm > hv_rhs).astype(int)
    t3_raw = t3_talib(close)
    t3 = np.where(np.isnan(t3_raw), close, t3_raw)
    t3_slope = np.zeros(N)
    t3_slope[60:] = t3[60:] - t3[:-60]
    is_up = (t3_slope > 0.2).astype(int)
    is_down = (t3_slope < -0.2).astype(int)
    is_none = ((is_up == 0) & (is_down == 0)).astype(int)

    cols = {
        "open": opn, "high": high, "low": low, "close": close,
        "typical_price": typical, "adx": adx, "di_pos": dip, "di_neg": dim,
        "di_diff": di_diff, "macd": macd, "macd_signal": sig, "macd_diff": hist,
        "psar": psar, "psar_trend": psar_trend, "psar_reversal": psar_reversal,
        "atr": atr, "atr_norm": atr_norm, "atr_change": atr_change,
        "high_volatility": high_vol, "t3": t3, "t3_slope": t3_slope,
        "is_uptrend": is_up, "is_downtrend": is_down, "is_no_trend": is_none,
    }
    names = list(cols)
    path = "src/test/resources/ta_golden.csv"
    with open(path, "w") as f:
        f.write(",".join(names) + "\n")
        for i in range(N):
            f.write(",".join(repr(float(cols[c][i])) for c in names) + "\n")
    print(f"wrote {path}: {N} rows x {len(names)} cols")


if __name__ == "__main__":
    main()
