#!/usr/bin/env python3
"""Linear-time oracle replays for the WITH RECURSIVE state machines.

DuckDB's recursive CTEs replay the H-family kernels one global iteration per
row — O(maxRowsPerSymbol) joins — which is exact but intractable past ~100k
rows per symbol (the sf1 hot symbol carries 500k). These replays compute the
SAME IEEE-754 double sequences in plain Python loops (Python floats are
doubles; operation order below mirrors graft.calc.ta.Ta statement-for-
statement), so the sf1+ sweeps can hash-check the recursive rows instead of
skipping them.

Two entry points:
  - h_family(con, name, fmt): full Python replay of the H-family queries
    (h1_recurrences / h1_adx / h1_t3 / h1_sar / h1_indicator_pass /
    h1_bucketed) from the events table registered on `con`.
  - peak_hybrid(con, sql): runs the oracle SQL's non-recursive CTE prefix in
    DuckDB, replaces ONLY the recursive `thin` CTE (scipy find_peaks'
    distance thinning) with a Python greedy loop, and resumes the SQL.
"""
import math


# --------------------------------------------------------------------- kernels
# Ports of graft/calc/ta/Ta.scala. Keep statement order identical: these
# must reproduce the JVM's doubles BIT-FOR-BIT.

NAN = float("nan")


def ieee_div(a, b):
    """a / b with JVM double semantics (DuckDB/Python raise or NULL on /0)."""
    if b != 0.0:
        return a / b
    # sign(inf) follows sign(a) XOR signbit(b); 0/0 and nan/0 -> nan
    return a * math.copysign(math.inf, b)


class Ema:
    __slots__ = ("k", "seed_sum", "n", "e", "period")

    def __init__(self, period):
        self.period = period
        self.k = 2.0 / (period + 1.0)
        self.seed_sum = 0.0
        self.n = 0
        self.e = NAN

    def update(self, x):
        self.n += 1
        if self.n < self.period:
            self.seed_sum += x
            return NAN
        if self.n == self.period:
            self.seed_sum += x
            self.e = self.seed_sum / self.period
            return self.e
        self.e = ((x - self.e) * self.k) + self.e
        return self.e


class Macd:
    __slots__ = ("fast_ema", "slow_ema", "sig_ema", "idx", "fast", "slow",
                 "signal", "macd", "sig", "hist")

    def __init__(self, fast=12, slow=26, signal=9):
        self.fast_ema = Ema(fast)
        self.slow_ema = Ema(slow)
        self.sig_ema = Ema(signal)
        self.idx = -1
        self.fast, self.slow, self.signal = fast, slow, signal
        self.macd = NAN
        self.sig = NAN
        self.hist = NAN

    def update(self, x):
        self.idx += 1
        s = self.slow_ema.update(x)
        f = self.fast_ema.update(x) if self.idx >= self.slow - self.fast else NAN
        if self.idx >= self.slow - 1:
            m = f - s
            sg = self.sig_ema.update(m)
            if self.idx >= self.slow + self.signal - 2:
                self.macd, self.sig, self.hist = m, sg, m - sg


def true_range(h, l, prev_close):
    hl = h - l
    hc = abs(h - prev_close)
    lc = abs(l - prev_close)
    return max(hl, hc, lc)


class Atr:
    __slots__ = ("prev_close", "seen", "tr_n", "sum", "atr", "period")

    def __init__(self, period=14):
        self.period = period
        self.prev_close = NAN
        self.seen = False
        self.tr_n = 0
        self.sum = 0.0
        self.atr = NAN

    def update(self, h, l, c):
        if not self.seen:
            self.prev_close = c
            self.seen = True
            return NAN
        tr = true_range(h, l, self.prev_close)
        self.prev_close = c
        self.tr_n += 1
        if self.tr_n < self.period:
            self.sum += tr
            return NAN
        if self.tr_n == self.period:
            self.sum += tr
            self.atr = self.sum / self.period
            return self.atr
        self.atr = ((self.atr * (self.period - 1)) + tr) / self.period
        return self.atr


class Adx:
    __slots__ = ("idx", "ph", "pl", "pc", "sm_plus", "sm_minus", "sm_tr",
                 "dx_sum", "dx_n", "adx", "di_plus", "di_minus", "period")

    def __init__(self, period=14):
        self.period = period
        self.idx = -1
        self.ph = self.pl = self.pc = NAN
        self.sm_plus = self.sm_minus = self.sm_tr = 0.0
        self.dx_sum = 0.0
        self.dx_n = 0
        self.adx = NAN
        self.di_plus = NAN
        self.di_minus = NAN

    def update(self, h, l, c):
        self.idx += 1
        if self.idx == 0:
            self.ph, self.pl, self.pc = h, l, c
            return
        diff_p = h - self.ph
        diff_m = self.pl - l
        tr = true_range(h, l, self.pc)
        self.ph, self.pl, self.pc = h, l, c
        p = self.period
        if self.idx < p:
            if diff_m > 0 and diff_p < diff_m:
                self.sm_minus += diff_m
            elif diff_p > 0 and diff_p > diff_m:
                self.sm_plus += diff_p
            self.sm_tr += tr
            return
        self.sm_minus -= self.sm_minus / p
        self.sm_plus -= self.sm_plus / p
        if diff_m > 0 and diff_p < diff_m:
            self.sm_minus += diff_m
        elif diff_p > 0 and diff_p > diff_m:
            self.sm_plus += diff_p
        self.sm_tr = self.sm_tr - self.sm_tr / p + tr
        if self.sm_tr != 0.0:
            self.di_minus = 100.0 * (self.sm_minus / self.sm_tr)
            self.di_plus = 100.0 * (self.sm_plus / self.sm_tr)
            s = self.di_plus + self.di_minus
            if self.dx_n < p:
                if s != 0.0:
                    self.dx_sum += 100.0 * (abs(self.di_plus - self.di_minus) / s)
                self.dx_n += 1
                if self.dx_n == p:
                    self.adx = self.dx_sum / p
            elif s != 0.0:
                self.adx = ((self.adx * (p - 1))
                            + 100.0 * (abs(self.di_plus - self.di_minus) / s)) / p
        else:
            self.di_minus = 0.0
            self.di_plus = 0.0


class Sar:
    __slots__ = ("idx", "is_long", "af", "ep", "sar", "prev_high", "prev_low",
                 "h0", "l0", "accel_init", "accel_max")

    def __init__(self, accel_init=0.02, accel_max=0.2):
        self.accel_init = accel_init
        self.accel_max = accel_max
        self.idx = -1
        self.is_long = True
        self.af = accel_init
        self.ep = NAN
        self.sar = NAN
        self.prev_high = self.prev_low = NAN
        self.h0 = self.l0 = NAN

    def update(self, h, l):
        self.idx += 1
        if self.idx == 0:
            self.h0, self.l0 = h, l
            self.prev_high, self.prev_low = h, l
            return NAN
        if self.idx == 1:
            diff_m = self.l0 - l
            diff_p = h - self.h0
            self.is_long = not (diff_m > 0 and diff_p < diff_m)
            if self.is_long:
                self.ep, self.sar = h, self.l0
            else:
                self.ep, self.sar = l, self.h0
        p_h, p_l = self.prev_high, self.prev_low
        self.prev_high, self.prev_low = h, l
        if self.is_long:
            if l <= self.sar:
                self.is_long = False
                self.sar = max(max(self.ep, p_h), h)
                out = self.sar
                self.af = self.accel_init
                self.ep = l
                self.sar = self.sar + self.af * (self.ep - self.sar)
                self.sar = max(max(self.sar, p_h), h)
            else:
                out = self.sar
                if h > self.ep:
                    self.ep = h
                    self.af = min(self.af + self.accel_init, self.accel_max)
                self.sar = self.sar + self.af * (self.ep - self.sar)
                self.sar = min(min(self.sar, p_l), l)
        else:
            if h >= self.sar:
                self.is_long = True
                self.sar = min(min(self.ep, p_l), l)
                out = self.sar
                self.af = self.accel_init
                self.ep = h
                self.sar = self.sar + self.af * (self.ep - self.sar)
                self.sar = min(min(self.sar, p_l), l)
            else:
                out = self.sar
                if l < self.ep:
                    self.ep = l
                    self.af = min(self.af + self.accel_init, self.accel_max)
                self.sar = self.sar + self.af * (self.ep - self.sar)
                self.sar = max(max(self.sar, p_h), h)
        return out


class T3:
    __slots__ = ("k", "omk", "c1", "c2", "c3", "c4", "e1", "e2", "e3", "e4",
                 "e5", "e6", "temp_sum", "phase", "n", "period")

    def __init__(self, period=60, v=0.7):
        self.period = period
        self.k = 2.0 / (period + 1.0)
        self.omk = 1.0 - self.k
        self.c1 = -(v * v * v)
        self.c2 = 3.0 * (v * v) + 3.0 * (v * v * v)
        self.c3 = -6.0 * (v * v) - 3.0 * v - 3.0 * (v * v * v)
        self.c4 = 1.0 + 3.0 * v + (v * v * v) + 3.0 * (v * v)
        self.e1 = self.e2 = self.e3 = self.e4 = self.e5 = self.e6 = NAN
        self.temp_sum = 0.0
        self.phase = 0
        self.n = 0

    def update(self, x):
        k, omk = self.k, self.omk
        if self.phase == 0:
            self.temp_sum += x
            self.n += 1
            if self.n == self.period:
                self.e1 = self.temp_sum / self.period
                self.phase = 1
                self.temp_sum = self.e1
                self.n = 0
            return NAN
        if self.phase < 6:
            self.e1 = (k * x) + (omk * self.e1)
            stage_out = self.e1
            if self.phase >= 2:
                self.e2 = (k * self.e1) + (omk * self.e2)
                stage_out = self.e2
            if self.phase >= 3:
                self.e3 = (k * self.e2) + (omk * self.e3)
                stage_out = self.e3
            if self.phase >= 4:
                self.e4 = (k * self.e3) + (omk * self.e4)
                stage_out = self.e4
            if self.phase >= 5:
                self.e5 = (k * self.e4) + (omk * self.e5)
                stage_out = self.e5
            self.temp_sum += stage_out
            self.n += 1
            if self.n == self.period - 1:
                seeded = self.temp_sum / self.period
                if self.phase == 1:
                    self.e2 = seeded
                elif self.phase == 2:
                    self.e3 = seeded
                elif self.phase == 3:
                    self.e4 = seeded
                elif self.phase == 4:
                    self.e5 = seeded
                elif self.phase == 5:
                    self.e6 = seeded
                self.phase += 1
                self.n = 0
                self.temp_sum = seeded
                if self.phase == 6:
                    return (self.c1 * self.e6 + self.c2 * self.e5
                            + self.c3 * self.e4 + self.c4 * self.e3)
            return NAN
        self.e1 = (k * x) + (omk * self.e1)
        self.e2 = (k * self.e1) + (omk * self.e2)
        self.e3 = (k * self.e2) + (omk * self.e3)
        self.e4 = (k * self.e3) + (omk * self.e4)
        self.e5 = (k * self.e4) + (omk * self.e5)
        self.e6 = (k * self.e5) + (omk * self.e6)
        return (self.c1 * self.e6 + self.c2 * self.e5
                + self.c3 * self.e4 + self.c4 * self.e3)


class Ring:
    __slots__ = ("buf", "size", "n", "pos")

    def __init__(self, size):
        self.size = size
        self.buf = [0.0] * size
        self.n = 0
        self.pos = 0

    def push(self, x):
        evicted = self.buf[self.pos] if self.n == self.size else NAN
        if self.n < self.size:
            self.n += 1
        self.buf[self.pos] = x
        self.pos = (self.pos + 1) % self.size
        return evicted

    def is_full(self):
        return self.n == self.size

    def seq_mean(self):
        """Oldest-first left-assoc sum, = Ta.Ring.seqMean's add order."""
        if self.n == 0:
            return NAN
        start = self.pos if self.n == self.size else 0
        s = 0.0
        for i in range(self.n):
            s += self.buf[(start + i) % self.size]
        return s / self.n


# ------------------------------------------------------------ H-family replay

FMT = "%Y-%m-%d %H:%M:%S.%f"

INDICATOR_COLS = [
    "typical_price", "adx", "di_pos", "di_neg", "di_diff",
    "macd", "macd_signal", "macd_diff", "psar", "psar_trend",
    "psar_reversal", "atr", "atr_norm", "atr_change", "high_volatility",
    "t3", "t3_slope", "is_uptrend", "is_downtrend", "is_no_trend"]

H_QUERIES = {
    "h1_recurrences": ["macd", "macd_signal", "macd_diff", "atr"],
    "h1_adx": ["adx", "di_pos", "di_neg"],
    "h1_t3": ["t3"],
    "h1_sar": ["psar"],
    "h1_indicator_pass": INDICATOR_COLS,
    "h1_bucketed": INDICATOR_COLS,
}


def _z(x):
    return 0.0 if x != x else x


class SymbolState:
    """graft.calc.IndicatorPass.SymbolState, indicator columns only."""
    __slots__ = ("macd", "adx", "atr", "sar", "t3", "atr_ring", "t3_ring",
                 "prev_atr", "prev_trend", "first", "thr")

    def __init__(self, slope_threshold=0.2):
        self.macd = Macd(12, 26, 9)
        self.adx = Adx(14)
        self.atr = Atr(14)
        self.sar = Sar(0.02, 0.2)
        self.t3 = T3(60, 0.7)
        self.atr_ring = Ring(14)
        self.t3_ring = Ring(60)
        self.prev_atr = 0.0
        self.prev_trend = 0
        self.first = True
        self.thr = slope_threshold

    def next(self, h, l, c):
        typical = (h + l + c) / 3.0

        self.adx.update(h, l, c)
        adx_v = _z(self.adx.adx)
        di_pos = _z(self.adx.di_plus)
        di_neg = _z(self.adx.di_minus)

        self.macd.update(c)

        psar_raw = self.sar.update(h, l)
        psar = c if psar_raw != psar_raw else psar_raw
        trend = 1 if c > psar else 0
        reversal = 0.0 if self.first else abs(float(trend) - float(self.prev_trend))
        self.prev_trend = trend

        atr_f = _z(self.atr.update(h, l, c))
        atr_norm = ieee_div(atr_f, c)
        atr_change = 0.0 if self.first else atr_f - self.prev_atr
        self.prev_atr = atr_f
        self.atr_ring.push(atr_norm)
        roll = self.atr_ring.seq_mean() if self.atr_ring.is_full() else 0.0
        high_vol = 1 if atr_norm > roll else 0

        t3_raw = self.t3.update(c)
        t3_v = c if t3_raw != t3_raw else t3_raw
        evicted = self.t3_ring.push(t3_v)
        t3_slope = 0.0 if evicted != evicted else t3_v - evicted
        is_up = 1 if t3_slope > self.thr else 0
        is_down = 1 if t3_slope < -self.thr else 0
        is_none = 1 if (is_up == 0 and is_down == 0) else 0

        self.first = False
        return (typical, adx_v, di_pos, di_neg, di_pos - di_neg,
                _z(self.macd.macd), _z(self.macd.sig), _z(self.macd.hist),
                psar, trend, reversal,
                atr_f, atr_norm, atr_change, high_vol,
                t3_v, t3_slope, is_up, is_down, is_none)


def h_family(con, name):
    """Returns (cols, rows) for an H-family query replayed linearly."""
    want = H_QUERIES[name]
    idx = [INDICATOR_COLS.index(c) for c in want]
    data = con.execute(f"""
        WITH ticks AS (
          SELECT event_type AS symbol, ts::TIMESTAMP AS tstamp, value AS price
          FROM events),
        candles AS (
          SELECT symbol, min(tstamp) AS tstamp, max(price) AS high,
            min(price) AS low, arg_max(price, tstamp) AS close
          FROM ticks GROUP BY symbol, date_trunc('second', tstamp))
        SELECT symbol, strftime(tstamp, '{FMT}') AS ts, high, low, close
        FROM candles ORDER BY symbol, tstamp""").fetchall()
    rows = []
    st = None
    cur = None
    for sym, ts, h, l, c in data:
        if sym != cur:
            cur = sym
            st = SymbolState()
        out = st.next(h, l, c)
        rows.append((sym, ts) + tuple(out[i] for i in idx))
    return ["symbol", "ts"] + want, rows


# --------------------------------------------------------- peak-thinning hybrid

PEAK_CFG = {"major": (10, 0.9), "minor": (7, 0.7), "micro": (5, 0.5)}


def _range_min(x):
    """Sparse table for O(1) range-min over numpy array x; returns f(i, j)
    = min(x[i:j]) (j exclusive), nan-free input assumed, empty -> None."""
    import numpy as np
    n = len(x)
    levels = [x]
    k = 1
    while 2 * k <= n:
        prev = levels[-1]
        levels.append(np.minimum(prev[:-k], prev[k:]))
        k *= 2

    def query(i, j):
        i, j = int(i), int(j)
        if j <= i:
            return None
        span = j - i
        lvl = span.bit_length() - 1
        k = 1 << lvl
        a = levels[lvl]
        return min(a[i], a[j - k])
    return query


def _find_peaks_group(xs):
    """scipy-find_peaks core for one (keys, side) signal (pos-dense array):
    plateau-midpoint maxima -> prominence (stack lb/rb + range-min bases)
    -> per-config (h DESC, p DESC) greedy distance thinning -> flags.
    Mirrors the SQL CTE chain sr1..flagged value-for-value.
    Returns [(cname, p)] surviving flags."""
    import numpy as np
    x = np.asarray(xs)
    n = len(x)
    # runs of equal value
    brk = np.flatnonzero(x[1:] != x[:-1]) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk - 1, [n - 1]))
    heights = x[starts]
    # interior maxima: strictly above both neighbor runs; plateau midpoint
    maxima = []
    for r in range(1, len(starts) - 1):
        if heights[r - 1] < heights[r] and heights[r + 1] < heights[r]:
            maxima.append(((starts[r] + ends[r]) // 2, heights[r]))
    if not maxima:
        return []
    # prev/next strictly-greater position via monotonic stacks
    prev_greater = np.full(n, -1, dtype=np.int64)
    stack = []
    for i in range(n):
        while stack and x[stack[-1]] <= x[i]:
            stack.pop()
        prev_greater[i] = stack[-1] if stack else -1
        stack.append(i)
    next_greater = np.full(n, n, dtype=np.int64)
    stack = []
    for i in range(n - 1, -1, -1):
        while stack and x[stack[-1]] <= x[i]:
            stack.pop()
        next_greater[i] = stack[-1] if stack else n
        stack.append(i)
    rmin = _range_min(x)
    proms = {}
    for p, h in maxima:
        lb = prev_greater[p]
        rb = next_greater[p]
        left = rmin(lb + 1, p)
        right = rmin(p + 1, rb)
        base = max(left if left is not None else h,
                   right if right is not None else h)
        proms[p] = h - base
    out = []
    for cname, (dist, pthr) in PEAK_CFG.items():
        kept = set()
        for p, h in sorted(maxima, key=lambda t: (-t[1], -t[0])):
            if any((p + d) in kept for d in range(-dist + 1, dist)):
                continue
            kept.add(p)
            if proms[p] >= pthr:
                out.append((cname, int(p)))
    return out


def peak_hybrid(con, sql):
    """Runs `sql` with the whole find_peaks CTE chain (sr1..flagged: the
    recursive `thin` AND the quadratic correlated pb/prom subqueries, which
    DuckDB grinds on a 500k-row hot chunk) replaced by the linear Python
    computation above. DuckDB still builds the `sig` signal and runs
    everything after `flagged` unchanged.
    """
    i_sr1 = sql.index("sr1 AS (")
    end_marker = "WHERE prom.prm >= cfg.pthr)"
    i_end = sql.index(end_marker) + len(end_marker)
    prefix = sql[:i_sr1].rstrip().rstrip(",")

    head = con.execute(prefix + "\nSELECT * FROM sig LIMIT 0")
    sig_cols = [d[0] for d in head.description]
    keys = sig_cols[:-3]  # sig = (*keys, side, pos, x)
    rows = con.execute(
        prefix + "\nSELECT * FROM sig ORDER BY "
        + ", ".join(keys + ["side", "pos"])).fetchall()

    flagged = []
    i = 0
    while i < len(rows):
        g = rows[i][:len(keys) + 1]
        j = i
        xs = []
        while j < len(rows) and rows[j][:len(keys) + 1] == g:
            xs.append(rows[j][-1])
            j += 1
        for cname, p in _find_peaks_group(xs):
            flagged.append((cname,) + g + (p,))
        i = j

    import pandas as pd
    flagged_py = pd.DataFrame(
        flagged, columns=["cname"] + keys + ["side", "p"])
    con.register("flagged_py", flagged_py)
    key_sel = ", ".join(["cname"] + keys + ["side", "p"])
    final_sql = (prefix + f",\nflagged AS (SELECT {key_sel} FROM flagged_py)"
                 + sql[i_end:])
    res = con.execute(final_sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


# ------------------------------------------------- exact set-similarity join

MINHASH_QUERIES = {"llm_jaccard_pairs", "llm_prefix_join",
                   "llm_minhash_dedup_verified"}


def _round6(x):
    """Spark round(_, 6) = BigDecimal.valueOf(x).setScale(6, HALF_UP)."""
    import decimal
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))


def _shingle_docs(con):
    """(doc_id, source, shingle-set) per document, mirroring the oracle SQL:
    norm = regexp_replace(lower(trim(text)), '\\s+', ' ', 'g');
    3-word shingles, whole norm when <= 3 tokens; distinct.
    DuckDB trim() strips SPACES only — so does .strip(' ')."""
    import re
    out = []
    for doc_id, source, text in con.execute(
            "SELECT doc_id, source, text FROM documents ORDER BY doc_id").fetchall():
        norm = re.sub(r"\s+", " ", text.strip(" ").lower())
        toks = norm.split(" ")
        if len(toks) <= 3:
            sh = frozenset([norm])
        else:
            sh = frozenset(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
        out.append((doc_id, source, sh))
    return out


def _true_jaccard_pairs(docs, t=0.8):
    """EXACT all-pairs-equivalent Jaccard join at threshold t via prefix
    filtering (AllPairs): J(A,B) >= t implies |A∩B| >= t·max(|A|,|B|), so
    the (|x| - ceil(t|x|) + 1)-prefixes under a global rarest-first shingle
    order must intersect — indexing prefixes only is complete, no recall
    loss, and linear-ish where the DuckDB n² replay was intractable.
    Returns [(id_a, id_b, jaccard)] with id_a < id_b (docs are scanned in
    doc_id order, so index hits are always the earlier doc).
    """
    from collections import defaultdict
    df = defaultdict(int)
    for _, _, sh in docs:
        for x in sh:
            df[x] += 1
    prefixes = []
    for _, _, sh in docs:
        lst = sorted(sh, key=lambda x: (df[x], x))
        p = len(lst) - math.ceil(t * len(lst)) + 1
        prefixes.append(lst[:p])
    index = defaultdict(list)
    out = []
    for i, (doc_id, _, sh) in enumerate(docs):
        cands = set()
        for x in prefixes[i]:
            cands.update(index[x])
            index[x].append(i)
        for j in sorted(cands):
            shj = docs[j][2]
            ni = len(sh & shj)
            nu = len(sh) + len(shj) - ni
            if ni / nu >= t:
                out.append((docs[j][0], doc_id, ni / nu))
    return out


def minhash_replay(con, name):
    """llm_jaccard_pairs / llm_minhash_dedup_verified without the n² DuckDB
    join. Same values as the SQL replays, any SF."""
    docs = _shingle_docs(con)
    pairs = _true_jaccard_pairs(docs)
    if name in ("llm_jaccard_pairs", "llm_prefix_join"):
        # llm_prefix_join shares the oracle: the engine's AllPairs/PPJoin
        # prefix filter and this replay's prefix index enumerate the SAME
        # complete pair set at tau=0.8
        return (["id_a", "id_b", "jaccard"],
                [(a, b, _round6(j)) for a, b, j in pairs])
    dup = {b for _, b, _ in pairs}
    by_source = {}
    for doc_id, source, _ in docs:
        if doc_id in dup:
            continue
        n, s = by_source.get(source, (0, 0))
        by_source[source] = (n + 1, s + doc_id)
    return (["source", "n_survivors", "sum_doc_id"],
            [(src, n, s) for src, (n, s) in sorted(by_source.items())])


# ---------------------------------------------- corpus pipeline / cosine dedup

def corpus_pipeline_replay(con, sql):
    """llm_corpus_pipeline with ONLY the n² Jaccard join (`p`/`dup` CTEs)
    replaced by the exact prefix-filtered join; gate, langid, exact dedup
    and the final aggregation still run in DuckDB unchanged."""
    i_p = sql.index("p AS (")
    dup_marker = "dup AS (SELECT DISTINCT id_b FROM p WHERE ni::DOUBLE / nu >= 0.8)"
    i_dup_end = sql.index(dup_marker) + len(dup_marker)
    prefix = sql[:i_p].rstrip().rstrip(",")
    rows = con.execute(prefix + "\nSELECT doc_id, sh FROM sh ORDER BY doc_id").fetchall()
    docs = [(did, None, frozenset(sh)) for did, sh in rows]
    dup = sorted({b for _, b, _ in _true_jaccard_pairs(docs)})
    import pandas as pd
    con.register("dup_py", pd.DataFrame({"id_b": dup}, dtype="int64"))
    final = prefix + ",\ndup AS (SELECT id_b FROM dup_py)" + sql[i_dup_end:]
    res = con.execute(final)
    return [d[0] for d in res.description], res.fetchall()


COSINE_DEDUP_QUERIES = {"llm_embed_neardup", "llm_embed_neardup_lsh"}

# round6(cos) >= 0.99 under HALF_UP <=> cos >= 0.9899995; numpy's pairwise
# reduction differs from the sequential sum by ~1e-14 on unit-ish 64-dim
# vectors, so a 1e-9 screening margin cannot lose a true candidate
_COS_THRESHOLD = 0.9899995
_COS_MARGIN = 1e-9


def cosine_dedup_replay(con, name):
    """The all-pairs exact-cosine dedup floor (oracle for both the exact and
    the LSH Spark paths) without DuckDB's 33M interpreted lambda pairs:
    numpy screens candidate pairs with a safety margin, then each candidate
    is recomputed with the SQL's exact left-to-right double accumulation.
    """
    import numpy as np
    rows = con.execute(
        "SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e "
        "FROM embeddings ORDER BY vec_id").fetchall()
    ids = [r[0] for r in rows]
    base = np.asarray([r[1] for r in rows], dtype=np.float64)
    # injected copies: elementwise double ops — numpy matches SQL bit-for-bit
    inj_mask = [i for i, v in enumerate(ids) if v % 50 == 0]
    all_ids = ids + [ids[i] + 100000 for i in inj_mask]
    E = np.vstack([base, base[inj_mask] * 1.001 + 0.01])
    n = len(all_ids)

    nrm = np.sqrt(np.einsum("ij,ij->i", E, E))
    cand = []
    blk = 1024
    for s0 in range(0, n, blk):
        b = E[s0:s0 + blk]
        cs = (b @ E.T) / (nrm[s0:s0 + blk, None] * nrm[None, :])
        for bi, gi in zip(*np.nonzero(cs >= _COS_THRESHOLD - _COS_MARGIN)):
            i = s0 + int(bi)
            j = int(gi)
            if i < j:
                cand.append((i, j))

    def seq_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    seq_norm = {}

    def norm_of(i):
        if i not in seq_norm:
            v = E[i].tolist()
            seq_norm[i] = math.sqrt(seq_dot(v, v))
        return seq_norm[i]

    dup = set()
    for i, j in cand:
        cos = _round6(seq_dot(E[i].tolist(), E[j].tolist())
                      / (norm_of(i) * norm_of(j)))
        if cos >= 0.99:
            # SQL orders the pair by vec_id: dup collects the LARGER id
            a, b = all_ids[i], all_ids[j]
            dup.add(max(a, b))
    survivors = [v for v in all_ids if v not in dup]
    return (["n_survivors", "sum_vec_id"], [(len(survivors), sum(survivors))])


def dup_clusters_replay(con):
    """llm_dup_clusters: union-find over the exact prefix-filtered Jaccard
    pairs — same components as the recursive transitive-closure SQL."""
    docs = _shingle_docs(con)
    pairs = _true_jaccard_pairs(docs)
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    groups = {}
    nodes = {a for a, _, _ in pairs} | {b for _, b, _ in pairs}
    for v in nodes:
        r = find(v)
        n, s = groups.get(r, (0, 0))
        groups[r] = (n + 1, s + v)
    return (["cluster_rep", "n_members", "sum_members"],
            [(r, n, s) for r, (n, s) in sorted(groups.items())])


def leakage_split_replay(con):
    """llm_leakage_split: clusters from the same union-find as
    dup_clusters_replay, singletons cluster to themselves; split by the
    md5-permille sampleKey of the cluster representative (train<800,
    val<900, else test)."""
    import hashlib
    docs = _shingle_docs(con)
    pairs = _true_jaccard_pairs(docs)
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    agg = {}
    for doc_id, _, _ in docs:
        cluster = find(doc_id)
        key = int(hashlib.md5(b"graft" + str(cluster).encode()).hexdigest()[:8], 16) % 1000
        split = "train" if key < 800 else ("val" if key < 900 else "test")
        n, cl, s = agg.get(split, (0, set(), 0))
        cl.add(cluster)
        agg[split] = (n + 1, cl, s + doc_id)
    return (["split", "n_docs", "n_clusters", "sum_doc_ids"],
            [(sp, n, len(cl), s) for sp, (n, cl, s) in sorted(agg.items())])


def pipeline_full_replay(con, sql):
    """Composite replay for the end-to-end pipeline row: the H1 block runs
    through the SymbolState linear machinery over VALIDATED+DEDUPED candles,
    the H2 block (marker-extracted, non-recursive) runs in DuckDB as-is, and
    the W14 block goes through peak_hybrid (linear find_peaks, rest in
    DuckDB). Joined per (symbol, ts) in Python exactly like the composite
    SQL's USING joins."""
    data = con.execute(f"""
        WITH ticks AS (
          SELECT event_type AS symbol, ts::TIMESTAMP AS tstamp, value AS price,
            event_id AS seq
          FROM events
          WHERE value > 0 AND user_id IS NOT NULL AND ts IS NOT NULL),
        tdd AS (
          SELECT * FROM ticks QUALIFY row_number() OVER (
            PARTITION BY symbol, tstamp ORDER BY seq DESC) = 1),
        candles AS (
          SELECT symbol, min(tstamp) AS tstamp, max(price) AS high,
            min(price) AS low, arg_max(price, tstamp) AS close
          FROM tdd GROUP BY symbol, date_trunc('second', tstamp))
        SELECT symbol, strftime(tstamp, '{FMT}') AS ts, high, low, close
        FROM candles ORDER BY symbol, tstamp""").fetchall()
    h1_rows = []
    st = None
    cur = None
    for sym, ts, h, l, c in data:
        if sym != cur:
            cur = sym
            st = SymbolState()
        out = st.next(h, l, c)
        h1_rows.append((sym, ts) + tuple(out))

    def between(a, b):
        return sql.split(a, 1)[1].split(b, 1)[0]

    h2_sql = between("/*H2*/", "/*ENDH2*/")
    h2_rows = con.execute(
        f"SELECT symbol, ts, candle_pattern_sum FROM ({h2_sql})").fetchall()
    h2_map = {(r[0], r[1]): r[2] for r in h2_rows}

    w14_cols, w14_rows = peak_hybrid(con, between("/*W14*/", "/*ENDW14*/"))
    i_sym = w14_cols.index("symbol")
    i_ats = w14_cols.index("anchor_timestamp")
    from collections import Counter
    anchors = Counter((r[i_sym], r[i_ats]) for r in w14_rows)

    cols = ["symbol", "ts"] + INDICATOR_COLS + ["candle_pattern_sum", "n_anchors"]
    rows = [r + (h2_map[(r[0], r[1])], anchors.get((r[0], r[1]), 0))
            for r in h1_rows]
    return cols, rows


def is_h_query(name):
    return name in H_QUERIES


def is_minhash_query(name):
    return name in MINHASH_QUERIES


def is_peak_query(sql):
    return "thin AS (" in sql and "flagged AS (" in sql


# --------------------------------------------- hash-oracle replays (round 9)
# The four production-hash rows (llm_fingerprints / llm_simhash_neardup /
# llm_minhash_dedup / llm_ann_recall) carry DuckDB CTE-chain oracles
# (LlmHashOracles) that are exact but lambda-slow past ~sf0.1. These numpy
# replays compute the identical values — hashes via scripts/spark_hashes
# (bit-validated ports of Spark's xxHash64/Murmur3) — in seconds at sf1+.

HASH_ORACLE_QUERIES = {
    "llm_fingerprints", "llm_simhash_neardup", "llm_minhash_dedup", "llm_ann_recall",
}


def _norm_docs(con, cols="doc_id, source"):
    return con.execute(
        f"SELECT {cols}, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') "
        "FROM documents ORDER BY doc_id").fetchall()


def _round4(x):
    import decimal
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP))


def fingerprints_replay(con):
    """llm_fingerprints: xxhash64 8-gram winnowing, per-source counts."""
    import numpy as np
    import spark_hashes as sh
    rows = _norm_docs(con)
    mats, lens, bounds = [], [], [0]
    for _, _, t in rows:
        b = np.frombuffer(t.encode(), dtype=np.uint8)
        if len(b) >= 8:
            g = np.lib.stride_tricks.sliding_window_view(b, 8)
        else:
            g = np.zeros((1, 8), dtype=np.uint8)
            g[0, :len(b)] = b
        mats.append(g)
        lens.append(np.full(g.shape[0], min(len(b), 8), dtype=np.int64))
        bounds.append(bounds[-1] + g.shape[0])
    grams = np.vstack(mats)
    data = np.zeros((grams.shape[0], 32), dtype=np.uint8)
    data[:, :8] = grams
    hs = sh.xxh64_short(data, np.concatenate(lens))
    per_source = {}
    for i, (doc_id, source, _) in enumerate(rows):
        h = hs[bounds[i]:bounds[i + 1]]
        if len(h) >= 4:
            w = np.lib.stride_tricks.sliding_window_view(h, 4).min(axis=1)
        else:
            w = np.array([h.min()])
        n_fp = len(np.unique(w))
        n, s = per_source.get(source, (0, 0))
        per_source[source] = (n + 1, s + n_fp)
    return (["source", "n_docs", "sum_fingerprints"],
            [(src, n, s) for src, (n, s) in sorted(per_source.items())])


_POPCNT = None


def _popcount64(a):
    import numpy as np
    global _POPCNT
    if _POPCNT is None:
        _POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return _POPCNT[a.view(np.uint8).reshape(a.shape + (8,))].sum(axis=-1).astype(np.int64)


def simhash_replay(con):
    """llm_simhash_neardup: token-xxhash64 sketches, 8x8 banding, Hamming
    histogram at maxDist 7."""
    import numpy as np
    import spark_hashes as sh
    from collections import defaultdict
    rows = _norm_docs(con, cols="doc_id")
    vocab = {}
    doc_tok = []
    for doc_id, t in rows:
        ids = []
        for w in t.split(" "):
            j = vocab.setdefault(w, len(vocab))
            ids.append(j)
        doc_tok.append((doc_id, np.asarray(ids, dtype=np.int64)))
    vh = sh.hash_strings(list(vocab.keys())).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bitsm = (((vh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1)
    sketches = np.zeros(len(doc_tok), dtype=np.uint64)
    masks = (np.uint64(1) << shifts)
    for i, (_, ids) in enumerate(doc_tok):
        votes = bitsm[ids].sum(axis=0)
        sketches[i] = masks[votes > 0].sum()
    buckets = defaultdict(list)
    for i in range(len(doc_tok)):
        for b in range(8):
            chunk = int((sketches[i] >> np.uint64(8 * b)) & np.uint64(255))
            buckets[(b, chunk)].append(i)
    seen = {}
    for members in buckets.values():
        if len(members) < 2:
            continue
        m = np.asarray(members)
        s = sketches[m]
        x = s[:, None] ^ s[None, :]
        dist = _popcount64(x)
        ii, jj = np.nonzero(dist <= 7)
        for a, b in zip(ii, jj):
            if a < b:
                seen[(int(m[a]), int(m[b]))] = int(dist[a, b])
    hist = {}
    for d in seen.values():
        hist[d] = hist.get(d, 0) + 1
    return (["dist", "n_pairs"], sorted(hist.items()))


def minhash_full_replay(con, sql):
    """llm_minhash_dedup: signatures, Murmur3 banding, est + exact Jaccard.
    The affine coefficient arrays are parsed from the oracle SQL itself, so
    the replay can never drift from the constants the engine inlined."""
    import re as _re
    import numpy as np
    import spark_hashes as sh
    from collections import defaultdict
    arrays = _re.findall(r"\[([0-9]+(?:,[0-9]+){127})\]", sql)
    assert len(arrays) >= 2, "expected the 128-long A/B literal arrays in the SQL"
    A = np.asarray([int(x) for x in arrays[0].split(",")], dtype=np.int64)
    B = np.asarray([int(x) for x in arrays[1].split(",")], dtype=np.int64)
    prime_m = _re.search(r"% (\d{9,10}) AS h", sql)
    prime = int(prime_m.group(1)) if prime_m else 2038074743
    docs = _shingle_docs(con)
    vocab = {}
    doc_sh = []
    for doc_id, _, shset in docs:
        ids = sorted(vocab.setdefault(s, len(vocab)) for s in shset)
        doc_sh.append((doc_id, np.asarray(ids, dtype=np.int64)))
    vh = sh.hash_strings(list(vocab.keys()))
    hm = np.mod(vh, prime)  # numpy mod = floorMod
    n = len(doc_sh)
    sigs = np.empty((n, 128), dtype=np.int64)
    hsets = []
    for i, (_, ids) in enumerate(doc_sh):
        h = np.unique(hm[ids])
        hsets.append(set(int(x) for x in h))
        sigs[i] = ((A[:, None] * h[None, :] + B[:, None]) % prime).min(axis=1)
    buckets = defaultdict(list)
    for b in range(16):
        bh = sh.murmur3_long_rows(sigs[:, b * 8:(b + 1) * 8])
        for i in range(n):
            buckets[(b, int(bh[i]))].append(i)
    cand = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b2 = members[x], members[y]
                if doc_sh[a][0] > doc_sh[b2][0]:
                    a, b2 = b2, a
                cand.add((a, b2))
    n_dup = 0
    n_true = 0
    dup_ids = set()
    for a, b2 in cand:
        est = float((sigs[a] == sigs[b2]).sum()) / 128.0
        if est >= 0.8:
            n_dup += 1
            dup_ids.add(doc_sh[b2][0])
        ni = len(hsets[a] & hsets[b2])
        nu = len(hsets[a]) + len(hsets[b2]) - ni
        if ni / nu >= 0.8:
            n_true += 1
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_cand = len(cand)
    return (["n_docs", "n_survivors", "n_candidate_pairs", "n_dup_pairs", "n_true_dup_pairs"],
            [(n_docs, n_docs - len(dup_ids), n_cand,
              n_dup if n_cand else None, n_true if n_cand else None)])


def _seq_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def ann_replay(con):
    """llm_ann_recall: sign-projection LSH buckets from xxhash64-derived
    hyperplanes; exact-sequential cosine rescoring wherever a numpy
    reduction could flip a rounded score or a sign."""
    import numpy as np
    import spark_hashes as sh
    from collections import defaultdict
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    ids = [r[0] for r in rows]
    E32 = np.asarray([r[1] for r in rows], dtype=np.float32)
    inj_mask = [i for i, v in enumerate(ids) if v % 50 == 0]
    inj32 = (E32[inj_mask] * np.float32(1.001) + np.float32(0.01)).astype(np.float32)
    all_ids = ids + [ids[i] + 100000 for i in inj_mask]
    A32 = np.vstack([E32, inj32])
    A64 = A32.astype(np.float64)
    dims = A64.shape[1]

    pg, dg = np.meshgrid(np.arange(64), np.arange(dims), indexing="ij")
    hp = sh.xxh64_int_pair(pg.ravel(), dg.ravel())
    comps = ((np.mod(hp, 2000001) - 1000000).astype(np.float64) / 1e6).reshape(64, dims)

    def bucket_rows(mat64, tables):
        proj = mat64 @ comps[:tables * 8].T  # (n, tables*8)
        # numpy matmul vs the engine's sequential fold differ ~1e-14; a
        # proj that close to 0 gets the exact sequential recompute
        sus = np.nonzero(np.abs(proj) < 1e-9)
        for r, c in zip(*sus):
            proj[r, c] = _seq_dot(mat64[r].tolist(), comps[c].tolist())
        bits = proj >= 0
        out = np.zeros((mat64.shape[0], tables), dtype=np.int64)
        for t in range(tables):
            out[:, t] = (bits[:, t * 8:(t + 1) * 8] *
                         (1 << np.arange(8))[None, :]).sum(axis=1)
        return out

    nrm64 = np.sqrt(np.einsum("ij,ij->i", A64, A64))
    seq_norm_cache = {}

    def seq_norm(i):
        if i not in seq_norm_cache:
            v = A64[i].tolist()
            seq_norm_cache[i] = math.sqrt(_seq_dot(v, v))
        return seq_norm_cache[i]

    def exact_cos(i, j):
        return _round6(_seq_dot(A64[i].tolist(), A64[j].tolist())
                       / (seq_norm(i) * seq_norm(j)))

    def topk_from_candidates(qi, cands, k):
        """exact (cos desc, neighbor vec_id) ranking of candidate row idxs."""
        if not cands:
            return []
        ca = np.asarray(sorted(cands))
        approx = (A64[ca] @ A64[qi]) / (nrm64[ca] * nrm64[qi])
        # keep everything that could reach the top-k after 1e-6 rounding
        thr = (np.sort(approx)[::-1][min(k - 1, len(ca) - 1)]) - 2e-6
        keep = ca[approx >= thr]
        scored = sorted(((exact_cos(qi, int(j)), -int(all_ids[int(j)]), int(j))
                         for j in keep), key=lambda t: (-t[0], -t[1]))
        return [(c, j) for c, _, j in scored[:k]]

    nb = len(ids)
    # noise path: base vectors, 4 tables
    nbuck = bucket_rows(A64[:nb], 4)
    nbuckets = defaultdict(list)
    for i in range(nb):
        for t in range(4):
            nbuckets[(t, int(nbuck[i, t]))].append(i)
    qrows = [i for i in range(nb) if ids[i] < 10]
    ncand = defaultdict(set)
    for members in nbuckets.values():
        ms = set(members)
        for q in members:
            if ids[q] < 10:
                ncand[q] |= ms - {q}
    napprox = {q: {j for _, j in topk_from_candidates(q, ncand.get(q, set()), 5)}
               for q in qrows}
    # exact brute-force top-5 over ALL vectors (base corpus only)
    exact5 = {}
    for q in qrows:
        exact5[q] = {j for _, j in
                     topk_from_candidates(q, set(range(nb)) - {q}, 5)}
    n_exact = sum(len(v) for v in exact5.values())
    n_noise = sum(len(exact5[q] & napprox.get(q, set())) for q in qrows)

    # near path: all vectors (base + injected), 8 tables
    abuck = bucket_rows(A64, 8)
    abuckets = defaultdict(list)
    for i in range(A64.shape[0]):
        for t in range(8):
            abuckets[(t, int(abuck[i, t]))].append(i)
    acand = defaultdict(set)
    for members in abuckets.values():
        ms = set(members)
        for q in members:
            if all_ids[q] >= 100000:
                acand[q] |= ms - {q}
    n_near_queries = len(inj_mask)
    n_near_hits = 0
    for q in range(nb, A64.shape[0]):
        top1 = topk_from_candidates(q, acand.get(q, set()), 1)
        if top1 and all_ids[top1[0][1]] == all_ids[q] - 100000:
            n_near_hits += 1
    return (["n_near_queries", "n_near_hits", "n_exact", "n_noise_recalled",
             "near_recall", "top5_noise_recall"],
            [(n_near_queries, n_near_hits, n_exact, n_noise,
              _round4(n_near_hits / n_near_queries),
              _round4(n_noise / n_exact))])


def hash_oracle_replay(con, name, sql):
    if name == "llm_fingerprints":
        return fingerprints_replay(con)
    if name == "llm_simhash_neardup":
        return simhash_replay(con)
    if name == "llm_minhash_dedup":
        return minhash_full_replay(con, sql)
    if name == "llm_ann_recall":
        return ann_replay(con)
    raise KeyError(name)


# ------------------------------------------- round-10 rows: pca / incremental

def gram_pca_replay(con):
    """emb_pca_project: quantized integer gram (numpy int64 — exact and
    order-free, same sums as the engine's Long aggregator), then the
    fixed-order power iteration in pure-Python doubles mirroring
    graft.functions.GramPca statement-for-statement, then sequential-order
    projections. Bit-exact at any SF; the SQL oracle's n×4096 gram explode
    is the only part that gets slow, and it is replaced here by one exact
    matmul."""
    import numpy as np
    from decimal import Decimal, ROUND_HALF_UP
    DIM, ITERS = 64, 40
    rows = con.execute(
        "SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) "
        "FROM embeddings ORDER BY vec_id").fetchall()
    # round-half-away on the exact double value == Spark BigDecimal HALF_UP
    # == DuckDB round(): all three compare the same double to the
    # representable .5 boundary (see GramPca.quantize doc)
    def rnd(v):
        return int(Decimal(v).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    Q = np.asarray([[rnd(x * 10000.0) for x in e] for _, _, e in rows],
                   dtype=np.int64)
    n = Q.shape[0]
    nd = float(n)
    G = Q.T @ Q  # exact int64 (|q| <= ~1e4 -> headroom to ~9e10 rows)
    M = [[(float(G[i][j]) / nd) / 1e8 for j in range(DIM)] for i in range(DIM)]

    def matvec(m, v):
        out = []
        for i in range(DIM):
            s = 0.0
            row = m[i]
            for j in range(DIM):
                s += row[j] * v[j]
            out.append(s)
        return out

    def power(m):
        v = [1.0 / math.sqrt(float(DIM))] * DIM
        for _ in range(ITERS):
            u = matvec(m, v)
            s = 0.0
            for x in u:
                s += x * x
            nrm = math.sqrt(s)
            v = [x / nrm for x in u]
        w = matvec(m, v)
        lam = 0.0
        for i in range(DIM):
            lam += v[i] * w[i]
        return v, lam

    v1, lam1 = power(M)
    M2 = [[M[i][j] - lam1 * v1[i] * v1[j] for j in range(DIM)] for i in range(DIM)]
    v2, lam2 = power(M2)
    l1r, l2r = _round6(lam1), _round6(lam2)
    out = []
    for (vid, lab, _), q in zip(rows, Q):
        p1 = 0.0
        for i in range(DIM):
            p1 += q[i] / 10000.0 * v1[i]
        p2 = 0.0
        for i in range(DIM):
            p2 += q[i] / 10000.0 * v2[i]
        out.append((vid, lab, _round6(p1), _round6(p2), l1r, l2r))
    return (["vec_id", "label", "p1", "p2", "lam1", "lam2"], out)


def _incremental_frames(con):
    """(corpus, batch) doc lists for llm_incremental_dedup: corpus =
    doc_id % 5 != 0, batch = doc_id % 5 == 0 plus each corpus doc with
    doc_id % 50 == 1 re-arriving as id+2000000 with the ' zqx zqy zqz'
    suffix. Returns [(doc_id, source, norm_text)] per frame."""
    import re
    rows = con.execute(
        "SELECT doc_id, source, text FROM documents ORDER BY doc_id").fetchall()

    def norm(text):
        return re.sub(r"\s+", " ", text.strip(" ").lower())

    corpus, batch = [], []
    for doc_id, source, text in rows:
        if doc_id % 5 != 0:
            corpus.append((doc_id, source, norm(text)))
            if doc_id % 50 == 1:
                batch.append((doc_id + 2000000, source, norm(text + " zqx zqy zqz")))
        else:
            batch.append((doc_id, source, norm(text)))
    batch.sort(key=lambda r: r[0])
    return corpus, batch


def _shingle_set(norm_text):
    toks = norm_text.split(" ")
    if len(toks) <= 3:
        return frozenset([norm_text])
    return frozenset(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))


def incremental_dedup_replay(con, sql):
    """llm_incremental_dedup: the full probe-vs-index LSH band pipeline in
    numpy — xxhash64 shingles, affine signatures, Murmur3 band keys (all
    constants parsed from the oracle SQL so the replay cannot drift),
    batch-band x corpus-band candidates, exact-Jaccard >= 0.7 verify over
    the mod-prime hash sets — plus the exact-fingerprint and keep-first
    legs, classified with the same priority."""
    import re as _re
    import numpy as np
    import spark_hashes as sh
    from collections import defaultdict
    arrays = _re.findall(r"\[([0-9]+(?:,[0-9]+){127})\]", sql)
    assert len(arrays) >= 2, "expected the 128-long A/B literal arrays"
    A = np.asarray([int(x) for x in arrays[0].split(",")], dtype=np.int64)
    B = np.asarray([int(x) for x in arrays[1].split(",")], dtype=np.int64)
    prime_m = _re.search(r"% (\d{9,10}) AS h", sql)
    prime = int(prime_m.group(1)) if prime_m else 2038074743
    corpus, batch = _incremental_frames(con)
    alldocs = corpus + batch
    # one shared vocab so every shingle hashes once
    vocab = {}
    doc_sh = []
    for doc_id, _, t in alldocs:
        ids = sorted(vocab.setdefault(s, len(vocab)) for s in _shingle_set(t))
        doc_sh.append((doc_id, np.asarray(ids, dtype=np.int64)))
    vh = sh.hash_strings(list(vocab.keys()))
    hm = np.mod(vh, prime)
    n = len(doc_sh)
    sigs = np.empty((n, 128), dtype=np.int64)
    hsets = []
    for i, (_, ids) in enumerate(doc_sh):
        h = np.unique(hm[ids])
        hsets.append(set(int(x) for x in h))
        sigs[i] = ((A[:, None] * h[None, :] + B[:, None]) % prime).min(axis=1)
    n_corpus = len(corpus)
    buckets = defaultdict(lambda: ([], []))  # (corpus idxs, batch idxs)
    for b in range(16):
        bh = sh.murmur3_long_rows(sigs[:, b * 8:(b + 1) * 8])
        for i in range(n):
            side = 0 if i < n_corpus else 1
            buckets[(b, int(bh[i]))][side].append(i)
    near_ids = set()
    seen_pairs = set()
    for cidx, bidx in buckets.values():
        for bi in bidx:
            bid = doc_sh[bi][0]
            for ci in cidx:
                key = (bi, ci)
                if key in seen_pairs:
                    continue
                seen_pairs.add(key)
                ni = len(hsets[bi] & hsets[ci])
                nu = len(hsets[bi]) + len(hsets[ci]) - ni
                if nu and ni / nu >= 0.7:
                    near_ids.add(bid)
    corpus_norms = {t for _, _, t in corpus}
    exact_ids = {d for d, _, t in batch if t in corpus_norms}
    first_by_norm = {}
    bdup_ids = set()
    for d, _, t in batch:  # batch sorted by doc_id
        if t in first_by_norm:
            bdup_ids.add(d)
        else:
            first_by_norm[t] = d
    agg = {}
    for d, src, _ in batch:
        nb, ne, nn, nbd, na, sa = agg.get(src, (0, 0, 0, 0, 0, 0))
        nb += 1
        if d in exact_ids:
            ne += 1
        elif d in near_ids:
            nn += 1
        elif d in bdup_ids:
            nbd += 1
        else:
            na += 1
            sa += d
        agg[src] = (nb, ne, nn, nbd, na, sa)
    return (["source", "n_batch", "n_exact_corpus", "n_near_corpus",
             "n_batch_dup", "n_admitted", "sum_admitted_ids"],
            [(src, nb, ne, nn, nbd, na, sa if na else None)
             for src, (nb, ne, nn, nbd, na, sa) in sorted(agg.items())])


def cluster_canonical_replay(con):
    """llm_cluster_canonical: union-find clusters from the exact
    prefix-filtered Jaccard pairs (same machinery as dup_clusters_replay),
    canonical member by the quality score computed in DuckDB SQL (the
    engine's own expression, bit-identical per row), ties to min doc_id."""
    docs = _shingle_docs(con)
    pairs = _true_jaccard_pairs(docs)
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {a for a, _, _ in pairs} | {b for _, b, _ in pairs}
    if not nodes:
        return (["cluster_rep", "n_members", "canonical_doc_id",
                 "canonical_q_bucket", "sum_discarded_ids"], [])
    en = con.execute("""
      SELECT doc_id,
        CASE WHEN len(list_filter(toks, t -> t SIMILAR TO '\\S+')) BETWEEN 5 AND 100000
          THEN 1.0 ELSE 0.0 END *
        (0.5 * (length(text) - length(regexp_replace(text, '[a-zA-Z ]', '', 'g')))::DOUBLE / greatest(length(text), 1) +
         0.5 * least(len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','that','it','for','on','with','as','at','this','a','an')))::DOUBLE / greatest(len(toks), 1) * 5, 1.0)) AS q
      FROM (SELECT doc_id, text,
          string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
        FROM documents)""").fetchall()
    qmap = dict(en)
    groups = {}
    for v in nodes:
        r = find(v)
        groups.setdefault(r, []).append(v)
    out = []
    for r, members in sorted(groups.items()):
        members.sort()
        canon = max(members, key=lambda d: (qmap[d], -d))
        bucket = int(math.floor(qmap[canon] * 10))
        out.append((r, len(members), canon, bucket, sum(members) - canon))
    return (["cluster_rep", "n_members", "canonical_doc_id",
             "canonical_q_bucket", "sum_discarded_ids"], out)


# ------------------------------------------------------------ dbscan replay

def dbscan_replay(con):
    """llm_dbscan_clusters: the all-pairs epsilon-graph without DuckDB's
    interpreted lambda pairs — numpy screens candidates with a safety
    margin, each candidate's cosine is recomputed with the SQL's exact
    sequential double accumulation, then the core/border/noise
    decomposition runs as plain union-find."""
    import numpy as np
    rows = con.execute(
        "SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e "
        "FROM embeddings ORDER BY vec_id").fetchall()
    ids = [r[0] for r in rows]
    idx_of = {v: i for i, v in enumerate(ids)}
    base = np.asarray([r[1] for r in rows], dtype=np.float64)

    def seq_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    # sequential norms of the ORIGINAL vectors: the engines' injection uses
    # sqrt(list_sum(...)) = left-fold, which numpy einsum may miss by an ulp
    seq_norm_base = [math.sqrt(seq_dot(r[1], r[1])) for r in rows]

    all_ids = list(ids)
    vecs = [base]
    for v in ids:
        if v % 25 == 0:
            for j in (1, 2, 3, 4):
                w = idx_of.get(v + j)
                if w is None:
                    continue
                c = 0.40 * (seq_norm_base[idx_of[v]] / seq_norm_base[w])
                all_ids.append(v + j * 100000)
                vecs.append((base[idx_of[v]] + c * base[w])[None, :])
            for j in (1, 2):
                all_ids.append(v + 400000 + j * 100000)
                vecs.append((base[idx_of[v]] * (1.0 + j * 0.0001)
                             + j * 0.001)[None, :])
    for v in ids:
        if v % 17 == 3 and v % 25 != 0:
            all_ids.append(v + 700000)
            vecs.append((base[idx_of[v]] * 1.001 + 0.01)[None, :])
    E = np.vstack(vecs)
    n = len(all_ids)

    # round6(cos) >= 0.9 under HALF_UP <=> cos >= 0.8999995; screen with a
    # 1e-9 margin for numpy's pairwise-reduction ulps, verify sequentially
    nrm = np.sqrt(np.einsum("ij,ij->i", E, E))
    cand = []
    blk = 1024
    for s0 in range(0, n, blk):
        b = E[s0:s0 + blk]
        cs = (b @ E.T) / (nrm[s0:s0 + blk, None] * nrm[None, :])
        for bi, gi in zip(*np.nonzero(cs >= 0.8999995 - 1e-9)):
            i = s0 + int(bi)
            j = int(gi)
            if i < j:
                cand.append((i, j))

    seq_norm = {}

    def norm_of(i):
        if i not in seq_norm:
            v = E[i].tolist()
            seq_norm[i] = math.sqrt(seq_dot(v, v))
        return seq_norm[i]

    nbrs = {}
    for i, j in cand:
        cos = _round6(seq_dot(E[i].tolist(), E[j].tolist())
                      / (norm_of(i) * norm_of(j)))
        if cos >= 0.9:
            nbrs.setdefault(i, set()).add(j)
            nbrs.setdefault(j, set()).add(i)

    min_pts = 6
    core = {i for i, ns in nbrs.items() if len(ns) + 1 >= min_pts}

    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    comp_min = {}
    for i in core:
        r = find(i)
        comp_min.setdefault(r, []).append(all_ids[i])
    rep_of_root = {r: min(members) for r, members in comp_min.items()}
    cluster_of = {i: rep_of_root[find(i)] for i in core}

    border_of = {}
    for i, ns in nbrs.items():
        if i in core:
            continue
        reps = [cluster_of[j] for j in ns if j in core]
        if reps:
            border_of[i] = min(reps)

    agg = {}
    for i, rep in cluster_of.items():
        a = agg.setdefault(rep, [0, 0, 0, 0])
        a[0] += 1
        a[2] += 1
        a[3] += all_ids[i]
    for i, rep in border_of.items():
        a = agg.setdefault(rep, [0, 0, 0, 0])
        a[1] += 1
        a[2] += 1
        a[3] += all_ids[i]
    out = [(rep, a[0], a[1], a[2], a[3]) for rep, a in sorted(agg.items())]
    noise_ids = [all_ids[i] for i in range(n)
                 if i not in cluster_of and i not in border_of]
    # SQL SUM over zero rows is NULL, not 0 — both engines emit NULL for an
    # empty noise set, so the replay must too (unreachable on the current
    # corpus, where original vectors are always noise, but a silent 0 here
    # would be a spurious hash mismatch the day that changes)
    out.append((-1, 0, 0, len(noise_ids),
                sum(noise_ids) if noise_ids else None))
    return (["cluster_rep", "n_core", "n_border", "n_members",
             "sum_members"], out)
