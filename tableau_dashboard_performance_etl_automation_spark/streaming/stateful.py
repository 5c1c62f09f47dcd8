"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's example of an operator Structured Streaming lacks as a
built-in: an incrementally-maintained per-key running profile (count /
sum / max seen so far) that survives across micro-batches. State is
partitioned by key across executors (bounded by key cardinality), and
batches arrive as Arrow-backed pandas frames — the same plumbing a
custom sessionizer or online sketch would use at production scale.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_value": [mx],
        }
    )


def running_key_profile(stream: DataFrame) -> DataFrame:
    """Per-event-type running profile, updated each micro-batch."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("run_len", LongType()),
    ]
)

RUN_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("run_len", LongType()),
        StructField("last_ts_key", LongType()),
        StructField("last_event_id", LongType()),
    ]
)


def _collapse_runs(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Emit each COMPLETED run (maximal streak of one event_type) for
    this user; the open tail run stays in state across micro-batches.
    Rows are sorted by (ts, event_id) inside the batch — the same
    total order the batch twin (`analytics.event_run_lengths`) uses.

    Cross-batch ordering: the state carries the (ts, event_id)
    frontier of the last event folded into the open run.  A row
    arriving in a LATER micro-batch with an OLDER (ts, event_id) is
    late relative to runs already emitted — folding it in would
    silently split/merge runs — so it is DROPPED here (detectable:
    the batch twin counts it, so the reconciliation test diverges by
    exactly the dropped rows).  Upstream must deliver each user's
    events in event-time order across micro-batches for exact parity;
    a watermark-delayed source or a per-trigger ordered replay (as in
    the tests) satisfies this."""
    if state.exists:
        last, run_len, last_ts_key, last_eid = state.get
    else:
        last, run_len, last_ts_key, last_eid = None, 0, -(2**62), -(2**62)
    done_types: list = []
    done_lens: list = []
    pdf = pd.concat(list(batches))
    pdf = pdf.sort_values(["ts", "event_id"])
    # order-preserving integer key for ts (ns for datetime64 input,
    # the raw value for integer input) — units only need to be
    # consistent across calls, which the stable column dtype gives
    ts_key = pdf["ts"].astype("int64").to_numpy()
    eids = pdf["event_id"].to_numpy()
    for et, t, eid in zip(pdf["event_type"], ts_key, eids):
        if (int(t), int(eid)) <= (last_ts_key, last_eid):
            # late arrival OR redelivered frontier event (equal keys,
            # the at-least-once replay artifact): drop, never corrupt
            continue
        last_ts_key, last_eid = int(t), int(eid)
        if et == last:
            run_len += 1
        else:
            if last is not None:
                done_types.append(last)
                done_lens.append(run_len)
            last, run_len = et, 1
    state.update((last, run_len, last_ts_key, last_eid))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(done_types),
            "event_type": done_types,
            "run_len": done_lens,
        }
    )


def run_length_collapse(stream: DataFrame) -> DataFrame:
    """Streaming twin of the consecutive-duplicate collapse
    (`analytics.event_run_lengths`): per-user state is one
    (last_type, run_len) tuple — O(keys) state, no timeline buffered —
    and a run is emitted exactly once, when the streak breaks."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _collapse_runs,
        outputStructType=RUN_OUTPUT_SCHEMA,
        stateStructType=RUN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("last_event_id", LongType()),
    ]
)


def _ts_ms(pdf: pd.DataFrame) -> "pd.Series":
    """Event time in MILLISECONDS — the unit the state's gap
    comparison against ``SESSION_GAP_MS`` requires.  datetime64 input
    is normalized to ns first (pandas 2.x / Arrow may hand this
    function datetime64[us] or [s] frames, whose raw int64 would be
    off by 10³-10⁶ against the ms constant); integer input is taken
    as already-ms."""
    if pd.api.types.is_datetime64_any_dtype(pdf["ts"]):
        return pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
    return pdf["ts"].astype("int64")


def _close_sessions(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Emit each CLOSED session (gap > SESSION_GAP_MS to the next
    event) for this user; the open tail session is carried in state.
    Per-user ``session_id`` is the same 1-based counter the batch
    sessionizer (`analytics.with_session_ids`) assigns, so the
    streamed output is row-identical to the batch twin
    (`streaming_twins.closed_sessions_final`) on an in-order stream.

    Ordering contract (same as ``_collapse_runs``): rows sort by
    (ts, event_id) within the batch, and the state's frontier drops
    late cross-batch arrivals — detectably, never corrupting sessions
    already emitted."""
    from tableau_dashboard_performance_etl_automation_spark.operators.analytics import (
        SESSION_GAP_MS,
    )

    if state.exists:
        sid, start_ms, last_ms, n_events, last_eid = state.get
    else:
        sid, start_ms, last_ms, n_events, last_eid = 0, 0, -(2**62), 0, -(2**62)
    out_sid: list = []
    out_n: list = []
    out_dur: list = []
    pdf = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    ms = _ts_ms(pdf).to_numpy()
    eids = pdf["event_id"].to_numpy()
    for t, eid in zip(ms, eids):
        t, eid = int(t), int(eid)
        if (t, eid) <= (last_ms, last_eid):
            # late cross-batch arrival OR a transport-level redelivery
            # of the frontier event itself (equal ts+event_id, the
            # at-least-once replay artifact): drop, never corrupt
            continue
        if n_events == 0:
            sid, start_ms, n_events = sid + 1, t, 1
        elif t - last_ms > SESSION_GAP_MS:
            out_sid.append(sid)
            out_n.append(n_events)
            out_dur.append(last_ms - start_ms)
            sid, start_ms, n_events = sid + 1, t, 1
        else:
            n_events += 1
        last_ms, last_eid = t, eid
    state.update((sid, start_ms, last_ms, n_events, last_eid))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_sid),
            "session_id": out_sid,
            "n_events": out_n,
            "duration_ms": out_dur,
        }
    )


def session_collapse(stream: DataFrame) -> DataFrame:
    """Streaming gap-based sessionizer (30-min inactivity, the
    engine-wide ``SESSION_GAP_MS`` definition): per-user state is one
    open session tuple — O(keys) state, no timeline buffered — and a
    session is emitted exactly once, when the first event beyond its
    gap closes it. The streaming half of the batch
    ``with_session_ids`` sessionizer; ``streaming_twins.
    closed_sessions_final`` registers the batch semantics with the
    oracle gate."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _close_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hll_estimate", DoubleType()),
        StructField("n_registers_set", LongType()),
    ]
)

#: HLL state = the m register maxima — the canonical bounded sketch
#: state (fixed size regardless of how many users stream through).
HLL_STATE_SCHEMA = StructType(
    [StructField("regs", ArrayType(LongType()))]
)


def _hll_update(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch into the per-type register maxima and
    emit the running estimate. The hash/register/ρ arithmetic is the
    SAME md5 pipeline as the batch twin
    (``operators.sketches.hll_distinct_users``) — hashlib.md5 here,
    ``F.md5`` there, identical bytes — so after the stream drains the
    state reproduces the batch registers exactly (reconciliation
    test: ``tests/test_streaming.py``). Register max is
    order-insensitive and mergeable, which is the whole reason an
    HLL can live in a state store."""
    import hashlib
    import math

    from tableau_dashboard_performance_etl_automation_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
    )

    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    for pdf in batches:
        # duplicates can't move a register max — hash each distinct
        # user once per batch
        for uid in pdf["user_id"].unique():
            h = hashlib.md5(str(uid).encode()).hexdigest()
            reg = int(h[0:2], 16) % HLL_M
            w = int(h[2:10], 16)
            rho = 33 - w.bit_length()  # 32-bit suffix; w=0 → 33
            if rho > regs[reg]:
                regs[reg] = rho
    state.update((regs,))
    z = sum(2.0 ** -m for m in regs if m > 0)
    v_empty = sum(1 for m in regs if m == 0)
    raw = HLL_ALPHA * HLL_M * HLL_M / (z + float(v_empty))
    if raw <= 2.5 * HLL_M and v_empty > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / v_empty)
    else:
        est = raw
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "hll_estimate": [round(est, 2)],
            "n_registers_set": [HLL_M - v_empty],
        }
    )


def hll_distinct_stream(stream: DataFrame) -> DataFrame:
    """Streaming HyperLogLog: per-event-type distinct-user estimate
    maintained in the state store — m register maxima per key, O(m)
    state no matter how many users stream through, updated per
    micro-batch and emitting the running estimate."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _hll_update,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CMS_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("n_events", LongType()),
        StructField("grid", ArrayType(LongType())),
    ]
)

#: CMS state = the flattened D×W counter grid — like the HLL
#: registers, a fixed-size mergeable sketch that can live in a state
#: store regardless of how many events stream through the shard.
CMS_STATE_SCHEMA = StructType(
    [StructField("grid", ArrayType(LongType()))]
)

#: Shards the streaming CMS is partitioned into (state parallelism).
CMS_SHARDS = 8


def _cms_update(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's events into the shard's D×W counter
    grid and emit the running grid. The row/bucket arithmetic is the
    SAME seeded-md5 pipeline as the batch twin
    (``operators.sketches.heavy_hitter_users_cms``: md5 of
    ``"{row}|{user_id}"``, first two hex digits → 0..255), and every
    event lands in the same (row, bucket) cells regardless of which
    shard counts it — so the cell-wise SUM of all shard grids equals
    the batch sketch exactly (counter addition is the mergeability
    CMS is built on; reconciliation test in
    ``tests/test_streaming.py``)."""
    import hashlib

    from tableau_dashboard_performance_etl_automation_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
    )

    grid = list(state.get[0]) if state.exists else [0] * (
        CMS_DEPTH * CMS_WIDTH
    )
    for pdf in batches:
        for uid in pdf["user_id"]:
            for r in range(CMS_DEPTH):
                h = hashlib.md5(f"{r}|{uid}".encode()).hexdigest()
                grid[r * CMS_WIDTH + int(h[0:2], 16)] += 1
    state.update((grid,))
    yield pd.DataFrame(
        {
            "shard": [key[0]],
            "n_events": [sum(grid) // CMS_DEPTH],
            "grid": [list(grid)],
        }
    )


def cms_grid_stream(stream: DataFrame) -> DataFrame:
    """Streaming count-min sketch, sharded for state parallelism:
    events hash-partition into ``CMS_SHARDS`` groups (``user_id %
    CMS_SHARDS``), each maintaining its own fixed-size counter grid
    in the state store. Per-shard state is O(D×W) no matter the
    event volume; the shard grids are cell-wise addable, so a reader
    merges them into the exact global sketch (the map-side-combine
    property, expressed as streaming state)."""
    import pyspark.sql.functions as F

    keyed = stream.select(
        F.pmod(F.col("user_id"), F.lit(CMS_SHARDS))
        .cast("bigint")
        .alias("shard"),
        "user_id",
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _cms_update,
        outputStructType=CMS_OUTPUT_SCHEMA,
        stateStructType=CMS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("cum_dev_cents", LongType()),
        StructField("max_pos_exc", LongType()),
        StructField("max_neg_exc", LongType()),
    ]
)

#: CUSUM state = four integers per key — O(1) drift-monitor state.
CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("cum_dev", LongType()),
        StructField("max_pos", LongType()),
        StructField("max_neg", LongType()),
    ]
)


def cusum_drift_stream(stream: DataFrame, target_cents: int) -> DataFrame:
    """Streaming CUSUM drift monitor per event type: fold each
    event's deviation from the provided ``target_cents`` reference
    rate into a running cumulative deviation, tracking the extreme
    positive/negative excursions — the online form of the batch
    ``statstests.daily_cusum_drift`` control chart, with O(1) state
    per key.

    The cumulative deviation is an order-free exact integer SUM, so
    after the stream drains it equals the batch total exactly
    whatever the micro-batch slicing (reconciliation test); the
    excursion extremes depend on event-time order and carry the same
    cross-batch ordering precondition as ``run_length_collapse``
    (rows sort by (ts, event_id) within each batch)."""

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, cum, mx, mn = state.get
        else:
            n, cum, mx, mn = 0, 0, 0, 0
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for cents in (
                pdf["value"].mul(100).round().astype("int64") - target_cents
            ):
                cum += int(cents)
                n += 1
                if cum > mx:
                    mx = cum
                if cum < mn:
                    mn = cum
        state.update((n, cum, mx, mn))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "cum_dev_cents": [cum],
                "max_pos_exc": [mx],
                "max_neg_exc": [mn],
            }
        )

    return stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SS_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("count_hat", LongType()),
        StructField("err", LongType()),
        StructField("n_seen", LongType()),
    ]
)

#: Space-Saving state = the m (item, count, error) counters — fixed
#: size regardless of how many distinct users stream through, the
#: property that lets a top-k summary live in a state store.
SS_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)


def _ss_update(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch into the per-type Space-Saving summary
    (Metwally et al. 2005): tracked item → count++; untracked with
    room → insert (1, 0); untracked and full → overwrite the minimum
    counter j as (count_j + 1, count_j).  Eviction tie-break is
    (count, user_id) ascending, so a replay in the same arrival
    order is bit-identical.  Unlike the HLL/CMS states the summary
    is order-DEPENDENT — the reconciliation test therefore checks
    the structure's guarantees against exact batch counts
    (containment of every count > N/m item; count ≤ count_hat ≤
    count + err), not value equality."""
    from tableau_dashboard_performance_etl_automation_spark.operators.sketches import (
        SS_CAPACITY,
    )

    if state.exists:
        items, counts, errs = state.get
        d = {i: [c, e] for i, c, e in zip(items, counts, errs)}
    else:
        d = {}
    for pdf in batches:
        for uid in pdf["user_id"]:
            uid = int(uid)
            if uid in d:
                d[uid][0] += 1
            elif len(d) < SS_CAPACITY:
                d[uid] = [1, 0]
            else:
                j = min(d, key=lambda k: (d[k][0], k))
                cj = d[j][0]
                del d[j]
                d[uid] = [cj + 1, cj]
    ks = sorted(d)
    state.update(
        ([int(k) for k in ks], [d[k][0] for k in ks], [d[k][1] for k in ks])
    )
    out = sorted(d.items(), key=lambda kv: (-kv[1][0], kv[0]))
    # Space-Saving identity: every arrival increments exactly one
    # counter (eviction replaces cj with cj+1), so sum(count_hat)
    # == items processed — emitted as n_seen so a sink can pick the
    # final trigger's summary without a trigger id.
    n_seen = sum(v[0] for _, v in out)
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(out),
            "user_id": [k for k, _ in out],
            "count_hat": [v[0] for _, v in out],
            "err": [v[1] for _, v in out],
            "n_seen": [n_seen] * len(out),
        }
    )


def spacesaving_topk_stream(stream: DataFrame) -> DataFrame:
    """Streaming Space-Saving top-k: per-event-type heavy-hitter
    summary maintained in the state store — m counters per key no
    matter how many distinct users stream through, emitting the full
    running summary each trigger (the final trigger's emission is
    the drained summary)."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _ss_update,
        outputStructType=SS_OUTPUT_SCHEMA,
        stateStructType=SS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RESERVOIR_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("k_rank", LongType()),
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
    ]
)

RESERVOIR_STATE_SCHEMA = StructType(
    [
        StructField("hks", ArrayType(StringType())),
        StructField("doc_ids", ArrayType(LongType())),
        StructField("langs", ArrayType(StringType())),
    ]
)


def _update_reservoir(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Keep this source's K smallest (hk, doc_id, lang) triples —
    hash-ordered, so the reservoir is a pure set function of the
    documents seen: arrival order, micro-batch boundaries, and
    restarts cannot change it, which is what makes the drained state
    EXACTLY equal to the batch twin (no reconciliation bounds needed,
    unlike Space-Saving). Emits the current reservoir each trigger;
    the final trigger's emission is the answer."""
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import GROUP_K

    if state.exists:
        hks, dids, lgs = state.get
        items = list(zip(hks, dids, lgs))
    else:
        items = []
    for pdf in batches:
        items.extend(
            zip(pdf["hk"].tolist(), pdf["doc_id"].tolist(), pdf["lang"].tolist())
        )
    # md5 hex strings: lexicographic == numeric order; doc_id breaks
    # the (practically impossible) hash tie deterministically
    items.sort(key=lambda t: (t[0], t[1]))
    items = items[:GROUP_K]
    state.update(
        (
            [t[0] for t in items],
            [int(t[1]) for t in items],
            [t[2] for t in items],
        )
    )
    yield pd.DataFrame(
        {
            "source": [key[0]] * len(items),
            "k_rank": list(range(1, len(items) + 1)),
            "doc_id": [int(t[1]) for t in items],
            "lang": [t[2] for t in items],
        }
    )


def reservoir_stream(stream: DataFrame) -> DataFrame:
    """Streaming deterministic reservoir: per-source exactly-K sample
    by smallest content-hash rank — the `applyInPandasWithState` form
    the batch twin's docstring points at
    (``sampling.grouped_reservoir_sample``: "a true streaming
    reservoir would be applyInPandasWithState"). Input must carry
    (source, doc_id, lang, hk) where hk is the SAME md5 the batch twin
    ranks by — computed JVM-side in the stream projection, so the
    Python hot path only merges/sorts ≤ K+batch rows per key. State
    per key is exactly K triples regardless of corpus size."""
    return stream.groupBy("source").applyInPandasWithState(
        _update_reservoir,
        outputStructType=RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
