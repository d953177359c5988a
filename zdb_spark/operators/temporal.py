"""Temporal joins: as-of (point-in-time) join and interval/range join.

The reference engine is a tick store — its users' canonical cross-table
question is "for each trade, what was the prevailing quote?", i.e. an
as-of join.  zdb itself has no join operator at all (SURVEY.md §2.7; the
only escape hatch is Julia inside `/q`, reference
/root/reference/src/server/query.rs:183-243), so these operators are part
of the capability-parity surface, expressed Spark-first.

Why not a sort-merge inequality join: Spark compiles a raw
``l.ts >= r.ts`` theta-join to BroadcastNestedLoopJoin (small side) or a
cartesian product (two big sides) — O(|L|·|R|) at 100 TB.  Both operators
here avoid inequality joins entirely:

* ``asof_join`` is the classic union-then-window formulation: tag both
  inputs, union them, and take ``last(<right payload>, ignorenulls)``
  over a window partitioned by the join keys and ordered by time.  Cost
  is ONE shuffle of |L|+|R| rows on the by-keys — no join node at all,
  no candidate blowup, and the window's running-``last`` is O(1) per row
  (UnboundedPreceding..CurrentRow over a monotone frame).  This is the
  same trick Flink's temporal table join and kdb's ``aj`` play.
* For the keyless (global) as-of, a single window partition would
  serialize the world, so ``asof_join`` switches to a bucket-carry plan:
  hash-partition by a coarse time bucket, resolve in-bucket matches with
  the same window, and close over bucket boundaries by precomputing each
  bucket's carry-in row (the latest right row at or before the bucket's
  start) from a per-bucket aggregate that is O(#buckets), not O(|R|).
* ``range_join`` (points-in-intervals) bucketizes the time axis:
  intervals explode to the coarse buckets they overlap, points carry
  their single bucket, and the match becomes an equi-join on
  (by-keys, bucket) + an exact residual filter.  Shuffle keys are
  uniform in time, so AQE has no skew to fight; replication factor is
  ``1 + span/bucket`` per interval, tunable via ``bucket``.

Both are exact (pytest-verified against naive formulations; the gate
verifies ``asof_join`` value-for-value against DuckDB's native ASOF
JOIN).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.scalar import round0

__all__ = ["asof_join", "asof_enrich", "range_join", "funnel",
           "retention", "user_paths", "twap", "decayed_avg",
           "rate_anomaly", "threshold_bars", "gapfill_daily_bars",
           "resample_ticks",
           "sessionize_counts",
           "parse_times", "ohlcv_bars"]

_SIDE = "_zdb_side"
_MATCH = "_zdb_match"
_BUCKET = "_zdb_bucket"


def _as_list(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by=None, *, direction: str = "backward",
              allow_exact_matches: bool = True,
              tolerance: int | None = None,
              how: str = "left", prefix: str = "r_",
              tiebreak: str | None = None,
              bucket: int = 3_600_000_000_000) -> DataFrame:
    """Point-in-time join: for each ``left`` row, attach the single
    ``right`` row with the largest ``on`` ≤ left's ``on`` (direction
    "backward"; smallest ≥ for "forward"), optionally within the same
    ``by`` keys and within ``tolerance`` units.

    Semantics match ``pandas.merge_asof`` / DuckDB ``ASOF JOIN``:
    * ``allow_exact_matches=False`` makes the inequality strict.
    * ``tolerance`` (same units as ``on``; for the canonical nanosecond
      timestamps, nanoseconds) null-outs matches farther than the bound —
      unmatched left rows survive under ``how="left"``, drop under
      ``how="inner"``.
    * Right payload columns arrive as ``prefix + name`` (including
      ``prefix + on`` = the matched timestamp) so self-joins of a table
      with itself can't collide.
    * ``tiebreak``: optional right column breaking ties between right
      rows sharing one ``on`` value (the larger wins); without it, equal
      right timestamps within a key are matched nondeterministically —
      pre-deduplicate or pass a tiebreak for a stable result.

    Execution: see module docstring.  With ``by`` keys: one shuffle, no
    join.  Keyless: three shuffles, all bounded (coarse ``bucket``-width
    time partitions + O(#buckets) carry-in aggregate), never a single
    global sort partition.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left/inner, got {how!r}")
    by = _as_list(by)
    payload = [c for c in right.columns if c not in by and c != on]

    # Right rows collapse to ONE struct column so ``last(ignorenulls)``
    # skips only left rows, never a legitimately-null right field.
    r_struct = F.struct(F.col(on).alias(on),
                        *[F.col(c) for c in payload]).alias(_MATCH)
    # Sort position at equal timestamps decides inclusivity: right-before-
    # left ⇒ a right row at the exact left ts is visible (inclusive).
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)

    l_tag = left.select(*[F.col(c) for c in left.columns],
                        F.lit(l_side).alias(_SIDE),
                        F.lit(None).cast("double").alias("_zdb_tb"),
                        F.lit(None).cast(
                            "struct<" + ",".join(
                                f"{f.name}:{f.dataType.simpleString()}"
                                for f in right.select(r_struct)
                                               .schema[_MATCH].dataType.fields)
                            + ">").alias(_MATCH))
    r_tag = right.select(*[F.col(c) for c in by],
                         F.col(on),
                         *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                           for c in left.columns if c not in by and c != on],
                         F.lit(r_side).alias(_SIDE),
                         (F.col(tiebreak).cast("double") if tiebreak
                          else F.lit(0.0)).alias("_zdb_tb"),
                         r_struct)
    both = l_tag.unionByName(r_tag.select(*l_tag.columns))

    order = [F.col(on), F.col(_SIDE), F.col("_zdb_tb")]
    if direction == "forward":
        # Mirror: scan time backwards; "side" tags keep their meaning
        # (right visible at equal ts iff inclusive) because only the time
        # axis flips, not the tag order.
        order = [F.col(on).desc(), F.col(_SIDE), F.col("_zdb_tb")]

    if by:
        w = (Window.partitionBy(*by).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = (both
                   .withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w))
                   .where(F.col(_SIDE) == l_side))
    else:
        matched = _asof_global(both, right, on, payload, order,
                               l_side, direction, bucket, tiebreak)

    m_on = F.col(f"{_MATCH}.{on}")
    if tolerance is not None:
        dist = (F.col(on) - m_on) if direction == "backward" else (m_on - F.col(on))
        matched = matched.withColumn(
            _MATCH, F.when(dist <= F.lit(tolerance), F.col(_MATCH)))

    out_cols = ([F.col(c) for c in left.columns]
                + [m_on.alias(f"{prefix}{on}")]
                + [F.col(f"{_MATCH}.{c}").alias(f"{prefix}{c}")
                   for c in payload])
    out = matched.select(*out_cols)
    if how == "inner":
        out = out.where(F.col(f"{prefix}{on}").isNotNull())
    return out


def _asof_global(both: DataFrame, right: DataFrame, on: str,
                 payload: list[str], order: list[Column], l_side: int,
                 direction: str, bucket: int,
                 tiebreak: str | None = None) -> DataFrame:
    """Keyless as-of: coarse time buckets + carry-in rows.

    In-bucket matches resolve with the same window as the keyed path,
    partitioned by bucket.  A left row whose predecessor lives in an
    EARLIER bucket is covered by the bucket's carry-in: per right-bucket
    ``max_by(match-struct, (on, tb))`` (one aggregate row per bucket —
    O(#buckets)), a running ``last`` over the tiny bucket table (window
    over #buckets rows, not data rows), shifted one bucket ahead and
    unioned in as a synthetic right row that sorts before everything in
    the bucket.  Total: shuffles on the uniform bucket key only.
    """
    sign = 1 if direction == "backward" else -1
    bexpr = F.floor(F.col(on) * sign / F.lit(bucket))
    both = both.withColumn(_BUCKET, bexpr)

    # Per-bucket best right row, outer-joined onto EVERY populated bucket
    # (left or right — gaps of empty buckets between a right row and much
    # later left rows must still see the carry), then a running-last over
    # STRICTLY PRECEDING buckets = the carry-in.  #populated buckets ≈
    # time-span/bucket: tiny, so the single-partition window over the
    # bucket table is deliberate and cheap — it never touches data rows.
    rb = right.select(bexpr.alias(_BUCKET), F.col(on), *payload,
                      (F.col(tiebreak).cast("double") if tiebreak
                       else F.lit(0.0)).alias("_zdb_ctb"))
    # rank honors the SAME tiebreak as the in-bucket window ("larger
    # wins" at equal timestamps) — ranking on (on) alone made the
    # carried row nondeterministic for equal-ts right rows
    rank = F.struct((F.col(on) * sign).alias("o"),
                    F.col("_zdb_ctb").alias("tb")).alias("_r")
    per_bucket = (rb.groupBy(_BUCKET)
                  .agg(F.max_by(F.struct(F.col(on).alias(on),
                                         *[F.col(c) for c in payload]),
                                rank).alias(_MATCH)))
    wb = (Window.orderBy(_BUCKET)
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = (both.select(_BUCKET).distinct()
             .join(per_bucket, _BUCKET, "left")
             .withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(wb))
             .where(F.col(_MATCH).isNotNull())
             .select(F.col(_BUCKET),
                     F.col(f"{_MATCH}.{on}").alias(on),
                     *[F.col(f"{_MATCH}.{c}").alias(c) for c in payload]))

    # Synthetic carry-in rows re-enter through the same tagging shape as
    # real right rows: side/tb forced to sort FIRST inside the bucket
    # (their true `on` is before the bucket start by construction, so the
    # natural time order already puts them first; side -1 guards the
    # degenerate equal-ts edge).
    carry_struct = F.struct(F.col(on).alias(on),
                            *[F.col(c) for c in payload]).alias(_MATCH)
    carry_tag = carry.select(
        *[F.lit(None).cast(both.schema[c].dataType).alias(c)
          for c in both.columns
          if c not in (_BUCKET, _SIDE, "_zdb_tb", _MATCH, on)],
        F.col(on), F.lit(-1).alias(_SIDE), F.lit(0.0).alias("_zdb_tb"),
        carry_struct, F.col(_BUCKET))

    all_rows = both.unionByName(carry_tag.select(*both.columns))
    w = (Window.partitionBy(_BUCKET).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (all_rows
            .withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w))
            .where(F.col(_SIDE) == l_side)
            .drop(_BUCKET))


def asof_enrich(df: DataFrame, right: DataFrame, on: str = "ts",
                by=None, *, prefix: str = "r_",
                allow_exact_matches: bool = True) -> DataFrame:
    """Stateless as-of ENRICHMENT against a broadcastable right side —
    the streaming-friendly sibling of :func:`asof_join`.

    The right table collapses to ONE row per ``by`` key holding a
    ts-sorted array of (ts, payload) structs; that dim broadcast-joins
    onto ``df`` and the point-in-time match is ``try_element_at(
    filter(arr, x -> x.ts <= ts), -1)`` — pure Catalyst higher-order
    functions, zero Python, no window, no state.  Because nothing here
    needs a sort or shuffle of the LEFT side, the exact same expression
    tree runs on a Structured Streaming DataFrame (stream–static
    broadcast joins are stateless), which the window-based
    :func:`asof_join` cannot.

    Use when the right side fits a broadcast (reference data, quote
    snapshots, config history): per-key match cost is O(right rows in
    that key) — linear scan, fine for the dim sizes broadcasting implies.
    For two large sides use :func:`asof_join`.
    """
    by = _as_list(by)
    payload = [c for c in right.columns if c not in by and c != on]
    arr = F.sort_array(F.collect_list(
        F.struct(F.col(on).alias(on), *[F.col(c) for c in payload])))
    dim = (right.groupBy(*by) if by else right.groupBy()) \
        .agg(arr.alias("_zdb_arr"))
    joined = (df.join(F.broadcast(dim), on=by, how="left") if by
              else df.crossJoin(F.broadcast(dim)))

    left_ts = F.col(on)
    cmp = ((lambda x: x[on] <= left_ts) if allow_exact_matches
           else (lambda x: x[on] < left_ts))
    m = F.try_element_at(F.filter(F.col("_zdb_arr"), cmp), F.lit(-1))
    return joined.select(
        *[F.col(c) for c in df.columns],
        m[on].alias(f"{prefix}{on}"),
        *[m[c].alias(f"{prefix}{c}") for c in payload])


def range_join(points: DataFrame, intervals: DataFrame, on: str = "ts",
               lo: str = "lo", hi: str = "hi", by=None, *,
               bucket: int = 3_600_000_000_000,
               bounds: str = "[]", how: str = "inner") -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    [lo, hi] range contains its ``on`` value (plus equal ``by`` keys).

    ``bounds`` picks interval closedness: "[]", "[)", "(]", "()".

    Execution: intervals explode to the coarse ``bucket``-width time
    buckets they overlap (``sequence(lo div b, hi div b)`` — replication
    1 + span/bucket per interval), points compute their single bucket,
    and the match is an equi-join on (by..., bucket) with the exact
    range predicate as a residual filter.  Each (point, interval) pair
    meets in EXACTLY one bucket (the point's), so no post-join dedup is
    needed.  Never a nested-loop/cartesian plan; shuffle keys are time
    buckets (uniform) plus by-keys.  ``how="left"`` keeps pointless—
    uncovered—points with null interval columns.
    """
    if bounds not in ("[]", "[)", "(]", "()"):
        raise ValueError(f"bounds must be one of [] [) (] (), got {bounds!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    by = _as_list(by)

    p = points.withColumn(_BUCKET, F.floor(F.col(on) / F.lit(bucket)))
    iv = (intervals
          .withColumn(_BUCKET, F.explode(F.sequence(
              F.floor(F.col(lo) / F.lit(bucket)),
              F.floor(F.col(hi) / F.lit(bucket))))))

    lo_ok = F.col(on) >= F.col(lo) if bounds[0] == "[" else F.col(on) > F.col(lo)
    hi_ok = F.col(on) <= F.col(hi) if bounds[1] == "]" else F.col(on) < F.col(hi)
    cond = [p[_BUCKET] == iv[_BUCKET], lo_ok, hi_ok]
    for k in by:
        cond.append(p[k] == iv[k])

    joined = p.join(iv, cond, how)
    keep = ([p[c] for c in points.columns]
            + [iv[c] for c in intervals.columns if c not in by])
    return joined.select(*keep)


def funnel(df: DataFrame, steps: list, ts_col: str = "ts",
           user_col: str = "user_id", step_col: str = "event_type",
           within: int | None = None) -> DataFrame:
    """Ordered N-step funnel — the event-analytics staple ("view →
    click → purchase within 2h each").

    An event qualifies for step *i* if its ``step_col`` matches
    ``steps[i]`` and its MOST RECENT prior-or-equal qualifying step-
    *i−1* event (same user) lies within ``within`` time units (always
    true when ``within`` is None).  Most-recent-anchor semantics — an
    event whose latest anchor is outside the window does NOT qualify
    even if an older anchor would — match DuckDB's chained ``ASOF
    JOIN``s, which the gate oracle uses.  Qualifying sets are distinct
    (user, ts) pairs, so same-instant duplicates count once.

    Returns one row per step: (step_idx, step, n_events, n_users).
    Cost: ONE shuffle of the step-typed events on the user key, total —
    not one per transition.  Every transition is a running
    most-recent-anchor lookup, and a running lookup over a
    user-partitioned, time-ordered stream is a window aggregate:
    qualification flags are computed per EVENT ROW as a stack of
    ``max(when(prev_flag, ts))`` windows sharing one
    ``partitionBy(user).orderBy(ts)`` spec (RANGE to current row, so an
    anchor at the exact event timestamp is visible — ASOF ``>=``
    semantics).  Spark satisfies every window in the stack from the
    first one's exchange+sort (same partitioning, same ordering), so N
    steps cost N window passes over sorted in-memory runs and ZERO
    additional exchanges — vs the previous union-at-the-end plan's
    ~3 exchanges per step (per-step distinct + asof union-window +
    post-filter distinct; r18 optimization, guide §2.4: window
    functions keyed like the preceding operation need no new shuffle).
    Flags are row-level and duplicate-safe: duplicate (user, ts) events
    carry equal flags, anchor lookups take ``max`` over them, and the
    final single aggregate counts DISTINCT (user, ts) pairs per step —
    bit-identical to the old distinct-set construction (same DuckDB
    chained-ASOF oracle, re-proven on registration).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = (df.where(F.col(step_col).isin(list(set(steps))))
            .select(F.col(user_col), F.col(ts_col), F.col(step_col)))
    w = (Window.partitionBy(user_col).orderBy(ts_col)
         .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    flags = [f"_zq{i}" for i in range(len(steps))]
    cur = ev.withColumn(flags[0], F.col(step_col) == steps[0])
    for i, step in enumerate(steps[1:], start=1):
        anchor = F.max(F.when(F.col(flags[i - 1]), F.col(ts_col))).over(w)
        cond = anchor.isNotNull()
        if within is not None:
            cond = cond & (F.col(ts_col) - anchor <= F.lit(within))
        cur = cur.withColumn(flags[i],
                             (F.col(step_col) == step) & cond)
    tags = F.array(*[F.when(F.col(fl), F.lit(i))
                     for i, fl in enumerate(flags)])
    tagged = cur.select(
        F.col(user_col), F.col(ts_col),
        F.explode(F.filter(tags, lambda x: x.isNotNull()))
         .alias("step_idx"))
    counts = (tagged.groupBy("step_idx")
              .agg(F.countDistinct(user_col, ts_col).alias("n_events"),
                   F.countDistinct(user_col).alias("n_users")))
    # A step nobody reaches has no rows to group — join the counts back
    # onto a literal step spine so it still reports (n_events=0,
    # n_users=0), like the old per-step global aggregates did.  The
    # spine carries the step names (step_idx is the unique key; a
    # repeated step label appears under each of its indices).
    spine = df.sparkSession.createDataFrame(
        list(enumerate(steps)), "step_idx int, step string")
    return (spine.join(counts, "step_idx", "left")
            .select("step_idx", "step",
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.coalesce("n_users", F.lit(0)).alias("n_users")))


def retention(df: DataFrame, ts_col: str = "ts",
              user_col: str = "user_id",
              period: int = 7 * 24 * 3_600_000_000_000) -> DataFrame:
    """Cohort retention: users grouped by first-seen period, counted in
    every later period they remain active.

    Output: (cohort, period_offset, n_active) — cohort = the user's
    first event's period index (epoch // period), offset = how many
    periods after that the user was active (0 = the cohort period
    itself).  The classic retention-matrix query.

    Shape at scale: each user's first event is a whole-partition
    ``min(ts)`` WINDOW over hash(user) — ONE shuffle of one projected
    event scan, replacing the previous groupBy-then-join-back shape
    (two event scans, two event-sized exchanges; r18 optimization,
    guide §2.4: the join keyed like the preceding aggregation was a
    second shuffle for data the window already co-locates).  The
    following distinct on (user, cohort, offset) is satisfied by the
    window's hash(user) partitioning (subset clustering — no new
    exchange); only the final (cohort, offset) count re-shuffles, and
    that input is one row per (user, period).  All keys are
    user-derived — skew only if one user dominates the event stream,
    which the same salting story as any keyed aggregate covers.
    """
    first_ts = F.min(ts_col).over(Window.partitionBy(user_col))
    ev = (df.select(user_col, ts_col)
          .select(user_col,
                  F.floor(first_ts / period).cast("long")
                   .alias("cohort"),
                  (F.floor(F.col(ts_col) / period)
                   - F.floor(first_ts / period)).cast("long")
                   .alias("period_offset"))
          .distinct())
    return (ev.groupBy("cohort", "period_offset")
            .agg(F.countDistinct(user_col).alias("n_active")))


def user_paths(df: DataFrame, ts_col: str = "ts",
               user_col: str = "user_id", step_col: str = "event_type",
               max_len: int = 5, top: int = 20) -> DataFrame:
    """Top event paths: each user's first ``max_len`` events (time
    order, ties broken by the step value) joined into a ``a>b>c`` path,
    counted across users — "what do users actually do first", the
    product-analytics path query.

    A ``row_number() OVER (PARTITION BY user ORDER BY ts, step)`` filter
    keeps only each user's first ``max_len`` events BEFORE any array is
    built, so the per-user aggregation buffer holds at most ``max_len``
    structs — a 10M-event bot account costs a disk-spillable external
    sort inside its window partition, never a 10M-element in-memory
    array.  The following groupBy(user) reuses the window's
    hash(user) partitioning (no second shuffle); the collected ≤max_len
    structs are ordered ROW-LOCALLY by a total (ts, step) sort so
    same-instant events order identically in any engine; then one small
    groupBy on the path string and a TakeOrdered top-k.
    """
    if max_len <= 0:
        raise ValueError("max_len must be positive")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(step_col))
    bounded = (df.select(user_col, ts_col, step_col)
               .withColumn("_zdb_rn", F.row_number().over(w))
               .where(F.col("_zdb_rn") <= max_len))
    collected = (bounded.groupBy(user_col)
                 .agg(F.sort_array(F.collect_list(
                     F.struct(F.col(ts_col).alias("t"),
                              F.col(step_col).alias("s")))).alias("evs")))
    path = F.array_join(
        F.transform(F.col("evs"), lambda e: e["s"]), ">")
    return (collected.select(path.alias("path"))
            .groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy(F.col("n_users").desc(), "path")
            .limit(top))


def twap(df: DataFrame, ts_col: str = "ts", by="event_type",
         value_col: str = "value",
         tie_col: str = "event_id") -> DataFrame:
    """Time-weighted average value per group — the tick-store TWAP:
    each observation is held until the group's next one (weight =
    ``lead(ts) - ts`` inside the group's own timeline; the final
    open-ended observation drops out).  The window orders by
    ``(ts, tie_col)`` so duplicate timestamps cannot flip the weights
    between engines — the determinism contract every oracle-checked
    operator here carries.

    One keyed window + one keyed aggregate on the SAME key (the agg
    reuses the window's hash partitioning — no second shuffle), no
    join, no collect.  Output: (by..., twap, n_obs), ``twap`` rounded
    to 6 dp via ``round0``.  Extracted from the round-4 gate inline
    form so composed reports (``tick_report``) execute the identical
    operator the singleton gate verifies."""
    by = _as_list(by)
    w = Window.partitionBy(*by).orderBy(F.col(ts_col), F.col(tie_col))
    gap = (F.lead(ts_col).over(w) - F.col(ts_col)).cast("double")
    return (df.withColumn("_zdb_w", gap)
            .where(F.col("_zdb_w").isNotNull())
            .groupBy(*by)
            .agg(round0(F.sum(F.col(value_col) * F.col("_zdb_w"))
                        / F.sum("_zdb_w"), 6).alias("twap"),
                 F.count(F.lit(1)).alias("n_obs")))


def decayed_avg(df: DataFrame, ts_col: str = "ts", by=None,
                value_col: str = "value", *, half_life: int,
                at: int) -> DataFrame:
    """Exponentially time-decayed aggregate — "what is the decayed
    average price as of T, half-life 7 days" — the kdb-style recency
    weighting tick analytics express with sequential EMAs.

    Uses the CLOSED (order-independent) form rather than the recursive
    update: weight(t) = 2^((t - at)/half_life) = exp(-ln2·(at-t)/hl) for
    every event at t <= ``at``.  Mathematically identical to folding the
    standard EMA update over the sorted stream, but each row's weight
    depends only on its own timestamp, so the whole thing is ONE
    partial-aggregated groupBy — no sort, no window, no sequential
    state, safe at any scale and any partitioning.  Events after ``at``
    are excluded (a look-ahead guard, not an error).

    Returns per ``by`` group: (decayed_avg, decayed_sum, w_sum, n).
    ``half_life`` and ``at`` are in ``ts_col`` units (canonical: nanos).
    """
    import math

    if half_life <= 0:
        raise ValueError(f"half_life must be positive, got {half_life}")
    by = _as_list(by)
    lam = math.log(2.0) / float(half_life)
    w = F.exp(F.lit(-lam)
              * (F.lit(at) - F.col(ts_col)).cast("double"))
    v = F.col(value_col).cast("double")
    filtered = df.where(F.col(ts_col) <= F.lit(at))
    g = filtered.groupBy(*by) if by else filtered.groupBy()
    return g.agg(
        round0(F.sum(v * w) / F.sum(w), 6).alias("decayed_avg"),
        round0(F.sum(v * w), 6).alias("decayed_sum"),
        round0(F.sum(w), 6).alias("w_sum"),
        F.count(F.lit(1)).alias("n"))


def rate_anomaly(df: DataFrame, ts_col: str = "ts",
                 by: str = "event_type", *,
                 bucket: int = 3_600_000_000_000,
                 trailing: int = 24,
                 min_periods: int = 4) -> DataFrame:
    """Per-key event-rate anomaly scores: each time bucket's count
    z-scored against the key's TRAILING ``trailing``-bucket window — the
    "did error rates spike this hour" monitoring staple.

    The trailing frame is RANGE-based on the bucket index (a gap of
    empty buckets narrows the sample rather than silently sliding older
    data in; absent buckets are absent, not zero — callers who want
    zero-filled baselines gap-fill first).  Buckets with fewer than
    ``min_periods`` trailing observations report NULL z (insufficient
    history ≠ anomalous).

    One groupBy (bucket counting) + one window partitioned by key and
    range-ordered by bucket — two keyed shuffles total, no self-joins;
    baseline and score are computed in the same pass.  Output:
    (by, bucket, n_events, baseline_mean, zscore).
    """
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    counts = (df.groupBy(F.col(by),
                         F.floor(F.col(ts_col) / F.lit(bucket))
                         .cast("long").alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    w = (Window.partitionBy(by).orderBy("bucket")
         .rangeBetween(-trailing, -1))
    mean = F.avg("n_events").over(w)
    std = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    n_obs = F.count(F.lit(1)).over(w)
    # std == 0 (perfectly flat baseline) must NOT collapse into the
    # insufficient-history NULL: a spike over a constant rate is the
    # clearest possible anomaly.  Report a capped sentinel z of ±1e9
    # (sign of the deviation) there; 0.0 when the value matches the
    # flat baseline exactly.
    z = F.when(n_obs >= min_periods,
               F.when(std > 0, (F.col("n_events") - mean) / std)
                .otherwise(F.signum(F.col("n_events") - mean)
                           * F.lit(1e9)))
    return counts.select(
        F.col(by), "bucket", "n_events",
        round0(mean, 6).alias("baseline_mean"),
        round0(z, 6).alias("zscore"))


def threshold_bars(df: DataFrame, ts_col: str = "ts",
                   symbol_col: str = "sym", price_col: str = "price",
                   size_col: str | None = None, *,
                   threshold: float, tie_col: str) -> DataFrame:
    """Event-driven bar sampling (volume / dollar bars — de Prado,
    *Advances in Financial Machine Learning* ch. 2): instead of fixed
    time buckets, a bar CLOSES when the symbol's cumulative size
    (volume for volume bars; price*volume for dollar bars — pass the
    product as ``size_col``) crosses ``threshold``.  Information
    arrival, not wall-clock, drives sampling — the standard fix for
    time bars' over-sampling of quiet periods.

    Bar assignment is the closed form ``floor(cum_before / threshold)``
    where ``cum_before`` is the cumulative size STRICTLY BEFORE the
    tick in (ts, tie) order — each tick's bar depends only on the
    prefix sum, so the whole sampler is ONE window cumsum plus one
    keyed aggregation on the same key (the agg reuses the window's
    hash(symbol) partitioning; two shuffles total, no iteration, no
    driver state).  ``tie_col`` makes duplicate timestamps
    deterministic — the oracle-replayability contract.

    Sizes must be NON-NEGATIVE (a negative size would make the prefix
    sum non-monotone and bars non-contiguous) — refused loudly at run
    time via an assertion column rather than silently emitting
    overlapping bars.

    Output per (symbol, bar): open/high/low/close of ``price_col``,
    n_ticks, bar_size (sum of sizes), start/end of ``ts_col``.

    Hoisted from ohlcv.py in r18 (the resample_ticks/ohlcv_bars
    precedent) so composed reports (``events_health``) execute the
    IDENTICAL operator the ``volume_bars`` singleton verifies;
    ohlcv.py re-exports it unchanged.

    100 TB shape: identical to twap — per-symbol windows spill to
    external sort; a single pathological symbol bounds the partition,
    and pre-bucketing by coarse time ranges (decade-bars) restores
    parallelism if one symbol dominates an epoch.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    size = F.col(size_col) if size_col else F.lit(1.0)
    size = size.cast("double")
    # loud bad-size guard: raise_error inside a when() costs one
    # codegen branch, not a pass.  NULL must refuse too — `size < 0`
    # is NULL for a NULL size, which would silently route the tick
    # into a spurious bar=NULL group instead of raising.
    size = F.when(size.isNull() | (size < 0),
                  F.raise_error(F.concat(
                      F.lit("threshold_bars: negative or NULL size "
                            "at "),
                      F.col(ts_col).cast("string")))).otherwise(size)
    w = (Window.partitionBy(symbol_col)
         .orderBy(F.col(ts_col), F.col(tie_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(size).over(w) - size
    bar = F.floor(cum_before / F.lit(float(threshold))).cast("long")
    p = F.col(price_col)
    return (df.withColumn("_zdb_bar", bar)
            .groupBy(F.col(symbol_col), F.col("_zdb_bar").alias("bar"))
            .agg(F.min_by(p, F.struct(F.col(ts_col), F.col(tie_col)))
                 .alias("open"),
                 F.max(p).alias("high"),
                 F.min(p).alias("low"),
                 F.max_by(p, F.struct(F.col(ts_col), F.col(tie_col)))
                 .alias("close"),
                 F.count(F.lit(1)).alias("n_ticks"),
                 F.sum(size).alias("bar_size"),
                 F.min(ts_col).alias("start_ts"),
                 F.max(ts_col).alias("end_ts")))


def gapfill_daily_bars(ticks: DataFrame,
                       grid_src: DataFrame | None = None,
                       ts_col: str = "ts",
                       sym_col: str = "event_type",
                       price_col: str = "value",
                       day_col: str = "d") -> DataFrame:
    """Gap-filled daily bars: the complete (sym × day) grid with
    missing days synthesized as zero-volume bars whose O/H/L/C all
    carry the last known close (standard candlestick continuity rule;
    days before a sym's first bar stay null).  ``ticks`` supplies the
    bars; ``grid_src`` (default: ``ticks``) supplies the day-range and
    symbol universe — pass the UNfiltered stream so thinned ticks
    still span the full calendar.  Both frames need a ``day_col``
    date column alongside ``ts_col``.

    The grid is dims-sized — a broadcast cross join of two tiny
    aggregates — and the forward fill is one running
    last(ignorenulls) window per sym, so the plan adds no data-sized
    shuffle beyond the bar aggregation itself.  Hoisted verbatim from
    the round-4 inline gate (``ohlcv_gapfill``) in r18 so composed
    reports (``events_health``) execute the identical operator the
    singleton gate verifies (the resample_ticks precedent)."""
    ev = grid_src if grid_src is not None else ticks
    bars = (ticks.groupBy(F.col(day_col).alias("bar_date"),
                          F.col(sym_col).alias("sym"))
            .agg(F.min_by(price_col, ts_col).alias("open"),
                 F.max(price_col).alias("high"),
                 F.min(price_col).alias("low"),
                 F.max_by(price_col, ts_col).alias("close"),
                 F.round(F.sum(price_col), 4).alias("volume"),
                 F.count(F.lit(1)).alias("n_ticks")))
    bounds = ev.agg(F.min(day_col).alias("lo"),
                    F.max(day_col).alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("bar_date"))
    syms = ev.select(F.col(sym_col).alias("sym")).distinct()
    grid = F.broadcast(syms).crossJoin(F.broadcast(days))
    w = (Window.partitionBy("sym").orderBy("bar_date")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (grid.join(bars, ["sym", "bar_date"], "left")
              .withColumn("ffill_close",
                          F.last("close", ignorenulls=True).over(w)))
    fc = F.col("ffill_close")
    return (filled.select(
        "sym",
        F.date_format("bar_date", "yyyy-MM-dd").alias("bar_date"),
        F.coalesce("open", fc).alias("open"),
        F.coalesce("high", fc).alias("high"),
        F.coalesce("low", fc).alias("low"),
        fc.alias("close"),
        F.coalesce("volume", F.lit(0.0)).alias("volume"),
        F.coalesce("n_ticks", F.lit(0)).alias("n_ticks")))


def resample_ticks(df: DataFrame, ts_col: str = "ts",
                   value_col: str = "value", *,
                   bucket_ns: int) -> DataFrame:
    """§2.3 TODO-resample (the reference's unimplemented endpoint,
    src/server.zig): tumbling ``bucket_ns`` buckets over integer-nanos
    timestamps — one partially-aggregated groupBy, bucket =
    ``ts div bucket_ns`` (pure codegen; no timestamp rounding UDF).
    Output: (hour_bucket, n_events, avg_value, min_value, max_value),
    avg rounded to 4 dp.  Hoisted verbatim from the round-4 inline
    gate so composed reports (``events_timeline``) execute the
    identical operator the ``resample_1h`` singleton verifies."""
    bucket = F.expr(f"{ts_col} div {int(bucket_ns)}")
    return (df.groupBy(bucket.alias("hour_bucket"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.avg(value_col), 4).alias("avg_value"),
                 F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value")))


def sessionize_counts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", *,
                      gap_ns: int) -> DataFrame:
    """Batch sessionization: per-user session count at a ``gap_ns``
    inactivity gap — lag + cumulative gap-count window, the BATCH form
    of the streaming applyInPandasWithState sessionizer (one keyed
    window + one keyed aggregate on the same key, so the agg reuses
    the window's hash partitioning).  Output: (user, n_sessions,
    n_events).  Hoisted verbatim from the round-4 inline gate
    (``sessionize_batch``) for composite coverage."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    with_gap = df.select(user_col, ts_col).withColumn(
        "new_session",
        (F.col(ts_col) - F.lag(ts_col, 1).over(w)
         > int(gap_ns)).cast("int"))
    return (with_gap.groupBy(user_col)
            .agg((F.coalesce(F.sum("new_session"), F.lit(0)) + 1)
                 .alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


def ohlcv_bars(df: DataFrame, ts_col: str = "ts",
               sym_col: str = "event_type",
               value_col: str = "value", *,
               day_col: str = "d") -> DataFrame:
    """§2.3 OHLCV aggregation: daily bars via min_by/max_by — open =
    first value by timestamp, close = last, one partially-aggregated
    groupBy (no window, no sort; min_by/max_by partials merge
    associatively, so the 100 TB plan is a single even shuffle on
    (day, sym)).  Output: (bar_date, sym, open, high, low, close,
    volume, n_ticks).  Hoisted verbatim from the round-4 inline gate
    (``ohlcv_daily``) so the events_timeline composite executes the
    identical operator; the API-granularity JSON form lives in
    zdb_spark/ohlcv.py (the reference's /ohlcv endpoint,
    src/server.zig)."""
    return (df.groupBy(F.date_format(day_col, "yyyy-MM-dd")
                       .alias("bar_date"),
                       F.col(sym_col).alias("sym"))
            .agg(F.min_by(value_col, ts_col).alias("open"),
                 F.max(value_col).alias("high"),
                 F.min(value_col).alias("low"),
                 F.max_by(value_col, ts_col).alias("close"),
                 F.round(F.sum(value_col), 4).alias("volume"),
                 F.count(F.lit(1)).alias("n_ticks")))


def parse_times(df: DataFrame, raw_col: str,
                out_col: str = "ts_ns") -> DataFrame:
    """F1 string→nanos as a frame operator: the 3-format parse (raw
    nanos | RFC3339 | %Y-%m-%d, reference src/lib.zig
    stringToNanoseconds) applied as the pure-Catalyst expression
    ``functions.scalar.parse_time_col`` — whole-stage codegen, no
    Python.  Appends ``out_col`` (long nanos).  The public frame form
    both the ``ts_parse`` singleton gate and composed reports
    execute."""
    from ..functions.scalar import parse_time_col

    return df.withColumn(out_col, parse_time_col(raw_col))
