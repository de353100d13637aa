"""Custom stateful streaming operators (applyInPandasWithState).

The batch engine's seen-set and metrics live in snapshot tables; a
continuously-fed deployment also wants PER-KEY running state inside the
stream itself — the classic applyInPandasWithState shape. Two operators:

  - host_discovery_totals: per-host cumulative discovered-URL counters that
    survive query restarts via the checkpointed state store (the streaming
    twin of the reference's per-spider `item_scraped_count`,
    GCSpider.py:28-31, which lives in driver memory and dies with the
    process).
  - host_session_stats: per-host crawl-session windows with an idle
    timeout — when a host goes quiet for `idle_ms`, its session row
    (url count, first/last event time) is emitted and state cleared
    (sessionization over the discovery feed).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TOTALS_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("urls_total", LongType()),
        StructField("batches_seen", LongType()),
    ]
)
TOTALS_STATE = StructType(
    [StructField("total", LongType()), StructField("batches", LongType())]
)


def _update_totals(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (total, batches) = state.get if state.exists else (0, 0)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    total += n
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame({"host": [key[0]], "urls_total": [total], "batches_seen": [batches]})


def host_discovery_totals(stream: DataFrame) -> DataFrame:
    """Per-host cumulative URL counters with checkpoint-durable state:
    restart the query on the same checkpoint and totals CONTINUE instead of
    resetting — state lives in the state store, not driver memory."""
    return stream.groupBy("host").applyInPandasWithState(
        _update_totals,
        outputStructType=TOTALS_OUTPUT,
        stateStructType=TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("urls_in_session", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("closed", StringType()),  # 'timeout' | 'open'
    ]
)
SESSION_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _session_factory(idle_ms: int):
    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            (n, first, last) = state.get
            state.remove()
            yield pd.DataFrame(
                {"host": [key[0]], "urls_in_session": [n],
                 "first_seen": [first], "last_seen": [last], "closed": ["timeout"]}
            )
            return
        n, first, last = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts = pd.to_datetime(pdf["discovered_at"])
            n += len(pdf)
            mn, mx = ts.min(), ts.max()
            first = mn if first is None or mn < first else first
            last = mx if last is None or mx > last else last
        state.update((n, first, last))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(
            {"host": [key[0]], "urls_in_session": [n],
             "first_seen": [first], "last_seen": [last], "closed": ["open"]}
        )

    return _update


def host_session_stats(stream: DataFrame, idle_ms: int = 60_000) -> DataFrame:
    """Per-host crawl sessions with an idle timeout (processing-time): a
    quiet host's session row is emitted with closed='timeout' and its state
    cleared; active hosts report closed='open' rows each batch."""
    return stream.groupBy("host").applyInPandasWithState(
        _session_factory(idle_ms),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


CUSUM_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n_events", LongType()),
        StructField("max_stat", DoubleType()),
        StructField("n_alarms", LongType()),
        StructField("first_alarm", LongType()),
    ]
)
CUSUM_STATE = StructType(
    [
        StructField("cum", DoubleType()),
        StructField("runmin", DoubleType()),
        StructField("n", LongType()),
        StructField("max_stat", DoubleType()),
        StructField("n_alarms", LongType()),
        StructField("first_alarm", LongType()),
    ]
)


def _cusum_factory(
    k_ref: float, h_threshold: float, x_col: str, ts_col: str, order_col: str
):
    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        cum, runmin, n, mx, na, fa = (
            state.get if state.exists else (0.0, 0.0, 0, 0.0, 0, None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            c = cum + (pdf[x_col].to_numpy(dtype=float) - k_ref).cumsum()
            rm = np.minimum(np.minimum.accumulate(c), runmin)
            s = c - rm
            alarms = s >= h_threshold
            if fa is None and bool(alarms.any()):
                fa = int(pdf[order_col].to_numpy()[int(alarms.argmax())])
            na += int(alarms.sum())
            mx = max(mx, float(s.max()))
            n += len(pdf)
            cum, runmin = float(c[-1]), float(rm[-1])
        state.update((cum, runmin, n, mx, na, fa))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_events": [n],
                "max_stat": [mx],
                "n_alarms": [na],
                "first_alarm": [fa],
            }
        )

    return _update


def streaming_cusum(
    stream: DataFrame,
    x_col: str = "fail",
    ts_col: str = "ts",
    order_col: str = "event_id",
    k_ref: float = 0.25,
    h_threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of operators/anomaly.cusum_alarms: per-host one-sided
    CUSUM maintained incrementally. The batch op's closed form S = C -
    min(0, running-min C) carries across micro-batches as TWO scalars per
    host (cum, runmin) in the checkpointed state store — restart-durable,
    O(1) state per key, Arrow-batched and numpy-vectorized within a batch.

    Assumes per-key batch arrival follows event order (an ordered replay /
    append-only log source, the same ordering contract the batch op's
    window imposes); rows inside a micro-batch are sorted by (ts, order).
    Emits the running (n_events, max_stat, n_alarms, first_alarm) per host
    each batch in update mode — the last row per host equals the batch
    answer over the full log."""
    return stream.groupBy("host").applyInPandasWithState(
        _cusum_factory(k_ref, h_threshold, x_col, ts_col, order_col),
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HIST_STATE = StructType(
    [
        StructField("buckets", ArrayType(IntegerType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

HIST_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n", LongType()),
        StructField("p50_est", LongType()),
        StructField("p95_est", LongType()),
        StructField("p99_est", LongType()),
    ]
)


def _hist_factory(value_col: str, percents: tuple):
    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        counters: dict[int, int] = {}
        if state.exists:
            bks, cts = state.get
            counters = dict(zip(bks, cts))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            v = pdf[value_col].to_numpy()
            for x in v:
                b = max(int(x), 1).bit_length()
                counters[b] = counters.get(b, 0) + 1
        bks = sorted(counters)
        cts = [counters[b] for b in bks]
        state.update((bks, cts))
        n = sum(cts)
        row = {"host": [key[0]], "n": [n]}
        cum = 0
        idx = 0
        # same integer math as operators/qsketch.histogram_quantiles:
        # first bucket whose cumulative count reaches ceil(p*n/100)
        cums = []
        for c in cts:
            cum += c
            cums.append(cum)
        for p in percents:
            thr = (n * p + 99) // 100
            est = None
            for b, cm in zip(bks, cums):
                if cm >= thr:
                    est = (1 << b) - 1
                    break
            row[f"p{p}_est"] = [est]
        yield pd.DataFrame(row)

    return _update


def streaming_size_histogram(
    stream: DataFrame, value_col: str = "sz", percents: tuple = (50, 95, 99)
) -> DataFrame:
    """Streaming twin of operators/qsketch (log2_histogram +
    histogram_quantiles): the per-host counter map IS the state — bounded
    at ~64 (bucket, count) pairs per host regardless of stream length,
    checkpoint-durable, merged counter-wise per micro-batch (the
    mergeability the batch op guarantees is exactly what makes the
    streaming state O(1)). Emits the running n/p50/p95/p99 per host each
    batch in update mode; the last row per host equals the batch answer
    over the full log. Order-insensitive (histograms commute), so no
    arrival-order contract is needed — unlike streaming_cusum."""
    return stream.groupBy("host").applyInPandasWithState(
        _hist_factory(value_col, percents),
        outputStructType=HIST_OUTPUT,
        stateStructType=HIST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_STATE = StructType(
    [
        StructField("terms", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

MG_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n_seen", LongType()),
        StructField("candidates", ArrayType(StringType())),
    ]
)


def _mg_factory(capacity: int, term_col: str):
    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        counters: dict[str, int] = {}
        n_seen = 0
        if state.exists:
            terms, counts, n_seen = state.get
            counters = dict(zip(terms, counts))
        for pdf in pdfs:
            for t in pdf[term_col]:
                n_seen += 1
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    # decrement-all: the classic MG step
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
        terms = sorted(counters)
        state.update((terms, [counters[t] for t in terms], n_seen))
        yield pd.DataFrame(
            {"host": [key[0]], "n_seen": [n_seen], "candidates": [terms]}
        )

    return _update


def streaming_heavy_hitters(
    stream: DataFrame, term_col: str = "term", capacity: int = 64
) -> DataFrame:
    """Streaming twin of operators/heavy_hitters: per-host Misra-Gries over
    an unbounded term stream with AT MOST `capacity` counters in the
    checkpointed state — the MG guarantee carries across micro-batches and
    restarts because the counter map IS the sequential algorithm's state:
    after any prefix, every term with frequency > n_seen/(capacity+1) is
    in `candidates`. Emits the candidate set per batch; exact counts for
    the candidates come from a batch-side confirm join, exactly like the
    batch op's two-phase shape."""
    return stream.groupBy("host").applyInPandasWithState(
        _mg_factory(capacity, term_col),
        outputStructType=MG_OUTPUT,
        stateStructType=MG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_STATE = StructType(
    [
        StructField("registers", ArrayType(IntegerType())),
        StructField("rhos", ArrayType(IntegerType())),
        StructField("n_items", LongType()),
    ]
)

HLL_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n_items", LongType()),
        StructField("n_registers", IntegerType()),
        StructField("est_distinct", LongType()),
    ]
)


def _hll_factory(item_col: str, p: int):
    import hashlib
    import math

    m = 1 << p
    wbits = 60 - p

    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        regs: dict[int, int] = {}
        n_items = 0
        if state.exists:
            r, rho, n_items = state.get
            regs = dict(zip(r, rho))
        for pdf in pdfs:
            for item in pdf[item_col]:
                n_items += 1
                # portable 60-bit hash — identical to operators/hll (and
                # therefore to the DuckDB twin): first 15 hex chars of sha256
                h = int(hashlib.sha256(str(item).encode()).hexdigest()[:15], 16)
                reg = h % m
                w = h >> p
                rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
                if rho > regs.get(reg, 0):
                    regs[reg] = rho
        keys = sorted(regs)
        state.update((keys, [regs[k] for k in keys], n_items))
        zeros = float(m - len(regs))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / (sum(2.0 ** -r for r in regs.values()) + zeros)
        if raw <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        else:
            est = raw
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_items": [n_items],
                "n_registers": [len(regs)],
                "est_distinct": [int(round(est))],
            }
        )

    return _update


def streaming_hll(
    stream: DataFrame, item_col: str = "url", p: int = 8
) -> DataFrame:
    """Streaming twin of operators/hll: per-host distinct-URL HyperLogLog
    whose 2^p registers ARE the checkpointed state — bounded (≤ 256 ints at
    p=8) no matter how many URLs stream past, restart-durable, and
    register-identical to the batch sketch over the same rows because both
    use the same portable 60-bit sha256-prefix hash. Emits the running
    (n_items, n_registers, est_distinct) per host per batch; merging a day
    of streamed registers into the batch rollup is operators/hll.hll_merge.
    """
    return stream.groupBy("host").applyInPandasWithState(
        _hll_factory(item_col, p),
        outputStructType=HLL_OUTPUT,
        stateStructType=HLL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


AIMD_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("rn", LongType()),
        StructField("delay_ms", DoubleType()),
    ]
)
AIMD_STATE = StructType(
    [StructField("delay", DoubleType()), StructField("seen", LongType())]
)


def _aimd_factory(
    seq_col: str, fail_col: str, base: float, dmin: float, dmax: float, dec: float
):
    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (delay, seen) = state.get if state.exists else (float(base), 0)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(seq_col)
        rns, delays = [], []
        for fail in rows[fail_col].to_numpy():
            delay = (
                min(2.0 * delay, float(dmax))
                if bool(fail)
                else max(delay - float(dec), float(dmin))
            )
            seen += 1
            rns.append(seen)
            delays.append(round(delay, 6))
        state.update((float(delay), int(seen)))
        yield pd.DataFrame(
            {"host": key[0], "rn": rns, "delay_ms": delays}
        )

    return _update


def streaming_aimd(
    stream: DataFrame,
    seq_col: str = "seq",
    fail_col: str = "fail",
    base: float = 1000.0,
    dmin: float = 100.0,
    dmax: float = 8000.0,
    dec: float = 250.0,
) -> DataFrame:
    """Streaming twin of operators/aimd: the per-host AIMD delay
    recurrence carried ACROSS micro-batches in checkpointed state (the
    current delay + outcome count — two scalars per host, bounded
    forever). A restart resumes mid-recurrence, so the emitted
    (host, rn, delay_ms) sequence over any series of AvailableNow runs is
    identical to the batch operator over the union of their rows. The
    per-batch loop is a host's outcomes within ONE micro-batch — bounded
    by the politeness budget per scheduling window, never history length.
    """
    return stream.groupBy("host").applyInPandasWithState(
        _aimd_factory(seq_col, fail_col, base, dmin, dmax, dec),
        outputStructType=AIMD_OUTPUT,
        stateStructType=AIMD_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DDSKETCH_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n", LongType()),
        StructField("q", DoubleType()),
        StructField("est_q", DoubleType()),
    ]
)
DDSKETCH_STATE = StructType(
    [
        StructField("buckets", ArrayType(IntegerType())),
        StructField("cnts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _ddsketch_factory(value_col: str, alpha: float, qs: tuple):
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lng = math.log(gamma)

    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        d: dict[int, int] = {}
        n = 0
        if state.exists:
            bks, cts, n = state.get
            d = dict(zip(bks, cts))
        for pdf in pdfs:
            for x in pdf[value_col]:
                x = float(x)
                if x <= 0:
                    continue
                # same bucket rule as operators/ddsketch.dd_bucket — the
                # round-9 quantization keeps JVM and CPython libm in step
                b = math.ceil(round(math.log(x) / lng, 9))
                d[b] = d.get(b, 0) + 1
                n += 1
        keys = sorted(d)
        state.update((keys, [d[k] for k in keys], n))
        rows = {"host": [], "n": [], "q": [], "est_q": []}
        for q in qs:
            rank = max(1, math.ceil(q * n))
            cum = 0
            bk = keys[-1] if keys else 0
            for b in keys:
                cum += d[b]
                if cum >= rank:
                    bk = b
                    break
            est = round(2.0 * gamma**bk / (gamma + 1.0), 6) if keys else 0.0
            rows["host"].append(key[0])
            rows["n"].append(n)
            rows["q"].append(float(q))
            rows["est_q"].append(est)
        yield pd.DataFrame(rows)

    return _update


def streaming_ddsketch(
    stream: DataFrame,
    value_col: str = "bytes",
    alpha: float = 0.01,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Streaming twin of operators/ddsketch: the per-host geometric bucket
    table IS the checkpointed state — bounded by occupied buckets (a few
    hundred over any realistic value range), restart-durable, and
    bucket-identical to the batch sketch over the same rows because both
    use ceil(round(ln(x)/ln_gamma, 9)). Emits running (n, q, est_q) rows
    per host per batch; a restart resumes the histogram, so the final
    batch's quantiles over a series of AvailableNow runs equal the batch
    operator over the union of their rows. Folding a day of streamed
    buckets into the batch rollup is operators/ddsketch.ddsketch_merge.
    """
    return stream.groupBy("host").applyInPandasWithState(
        _ddsketch_factory(value_col, alpha, qs),
        outputStructType=DDSKETCH_OUTPUT,
        stateStructType=DDSKETCH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BENFORD_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n", LongType()),
        StructField("chi2", DoubleType()),
        StructField("tvd", DoubleType()),
        StructField("top_digit_share", DoubleType()),
        StructField("benford_alarm", BooleanType()),
    ]
)
BENFORD_STATE = StructType([StructField("counts", ArrayType(LongType()))])


def _benford_factory(value_col: str, alarm_chi2: float):
    import math

    ps = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]

    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        counts = [0] * 9
        if state.exists:
            (stored,) = state.get
            counts = list(stored)
        for pdf in pdfs:
            for x in pdf[value_col]:
                x = float(x)
                if x <= 0 or math.isnan(x):
                    continue
                # same first-digit rule as operators/benford:
                # floor(v / 10^floor(log10(v)))
                d = int(x / (10.0 ** math.floor(math.log10(x))))
                if 1 <= d <= 9:
                    counts[d - 1] += 1
        state.update((counts,))
        n = sum(counts)
        if n:
            chi2 = round(
                sum((c - p * n) ** 2 / (p * n) for c, p in zip(counts, ps)),
                6,
            )
            tvd = round(
                sum(abs(c / n - p) for c, p in zip(counts, ps)) / 2.0, 6
            )
            top = round(max(counts) / n, 6)
        else:
            chi2 = tvd = top = 0.0
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n": [n],
                "chi2": [chi2],
                "tvd": [tvd],
                "top_digit_share": [top],
                "benford_alarm": [bool(chi2 > alarm_chi2)],
            }
        )

    return _update


def streaming_benford(
    stream: DataFrame,
    value_col: str = "bytes",
    alarm_chi2: float = 15.507,
) -> DataFrame:
    """Streaming twin of operators/benford: the per-host first-digit
    counter vector (exactly 9 longs) IS the checkpointed state — the
    smallest possible sketch, restart-durable, and digit-identical to
    the batch operator because both use floor(v / 10^floor(log10(v))).
    Emits a running (n, chi2, tvd, top_digit_share, benford_alarm) row
    per host per batch; after any sequence of AvailableNow runs the last
    row per host equals benford_deviation over the union of their rows —
    the always-on generated-content alarm for a continuously-fed crawl.
    """
    return stream.groupBy("host").applyInPandasWithState(
        _benford_factory(value_col, alarm_chi2),
        outputStructType=BENFORD_OUTPUT,
        stateStructType=BENFORD_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPRT_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n_trials", LongType()),
        StructField("llr", DoubleType()),
        StructField("decision", StringType()),
        StructField("n_at_decision", LongType()),
    ]
)
SPRT_STATE = StructType(
    [
        StructField("llr", DoubleType()),
        StructField("n", LongType()),
        StructField("decision", StringType()),
        StructField("n_at", LongType()),
    ]
)


def _sprt_factory(
    outcome_col: str, order_col: str, p0: float, p1: float,
    alpha: float, beta: float
):
    import math

    up = math.log((1.0 - beta) / alpha)
    dn = math.log(beta / (1.0 - alpha))
    inc1 = math.log(p1 / p0)
    inc0 = math.log((1.0 - p1) / (1.0 - p0))

    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        llr, n, decision, n_at = (
            state.get if state.exists else (0.0, 0, "continue", None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(order_col)
            for y in pdf[outcome_col]:
                n += 1
                llr += inc1 if int(y) == 1 else inc0
                if decision == "continue":
                    # first crossing freezes the verdict (Wald's rule);
                    # the walk keeps accumulating for the llr readout
                    if llr >= up:
                        decision, n_at = "accept_h1", n
                    elif llr <= dn:
                        decision, n_at = "accept_h0", n
        state.update((llr, n, decision, n_at))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_trials": [n],
                "llr": [round(llr, 6)],
                "decision": [decision],
                "n_at_decision": [n_at if n_at is not None else pd.NA],
            }
        )

    return _update


def streaming_sprt(
    stream: DataFrame,
    outcome_col: str = "err",
    order_col: str = "event_id",
    p0: float = 0.15,
    p1: float = 0.3,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Streaming twin of operators/sprt: the sequential test is the
    natively-streaming member of the experimentation family — its whole
    per-host state is ONE cumulative log-likelihood ratio plus the frozen
    verdict (four scalars), checkpoint-durable, so a source trial
    resumes mid-walk across restarts. Same ordered-replay contract as
    streaming_cusum (per-key arrival follows trial order; rows inside a
    micro-batch are sorted). The last emitted row per host equals
    sprt_decisions over the union of all rows, except that llr here is
    the FULL walk's endpoint (identical to batch llr_final)."""
    return stream.groupBy("host").applyInPandasWithState(
        _sprt_factory(outcome_col, order_col, p0, p1, alpha, beta),
        outputStructType=SPRT_OUTPUT,
        stateStructType=SPRT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOLT_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast", DoubleType()),
        StructField("mae", DoubleType()),
    ]
)
HOLT_STATE = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("n", LongType()),
        StructField("sae", DoubleType()),
    ]
)


def _holt_factory(value_col: str, order_col: str, alpha: float, beta: float, horizon: int):
    def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        l, b, n, sae = state.get if state.exists else (0.0, 0.0, 0, 0.0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(order_col)
            for y in pdf[value_col]:
                y = float(y)
                if n == 0:
                    l, b, n, sae = y, 0.0, 1, 0.0
                else:
                    sae += abs(y - (l + b))
                    l_new = alpha * y + (1.0 - alpha) * (l + b)
                    b = beta * (l_new - l) + (1.0 - beta) * b
                    l = l_new
                    n += 1
        state.update((l, b, n, sae))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n": [n],
                "level": [round(l, 6)],
                "trend": [round(b, 6)],
                "forecast": [round(l + float(horizon) * b, 6)],
                "mae": [round(sae / (n - 1), 6) if n > 1 else pd.NA],
            }
        )

    return _update


def streaming_holt(
    stream: DataFrame,
    value_col: str = "y",
    order_col: str = "t",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
) -> DataFrame:
    """Streaming twin of operators/holt: the level/trend recurrence is
    natively streaming — per-host state is FOUR scalars (level, trend,
    n, sum of absolute one-step errors), checkpoint-durable, so the
    capacity forecast survives restarts and replays to exactly the
    batch holt_forecast over the union of all rows (same ordered-replay
    contract as streaming_cusum/streaming_sprt: per-key arrival follows
    series order; rows inside a micro-batch are sorted by order_col)."""
    return stream.groupBy("host").applyInPandasWithState(
        _holt_factory(value_col, order_col, alpha, beta, horizon),
        outputStructType=HOLT_OUTPUT,
        stateStructType=HOLT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
