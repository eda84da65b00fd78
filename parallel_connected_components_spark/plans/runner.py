"""Iterative-fixpoint driver: convergence, iteration caps, checkpointing,
resume, and per-iteration metrics.

This is the Spark replacement for every ``while (changed)`` loop in the
reference — the frontier loop (/root/reference/src/cc_sequential.c:75-162),
the OpenMP double-buffered sync loop (/root/reference/src/cc_openmp.c:62-125,
bounded by max_iterations = V at :82), the MPI Allreduce-voted loops
(/root/reference/src/mpi/cc_mpi.c:518-525, capped at 1000, :2060). Each
engine iteration is one Spark job; the shuffle plays the role of the
Allgatherv/halo exchange; the changed-count action is the Allreduce.

What the C code cannot have but Spark must (risk R2, SURVEY.md §7):
unbounded logical-plan growth across iterations. Handled two ways:
- every iteration: ``localCheckpoint(eager=True)`` truncates lineage
  in-memory (cheap, non-resumable);
- every ``snapshot_every`` iterations (and at convergence): a durable
  parquet/Iceberg snapshot via :class:`TableLayer`, carrying the
  iteration number, changed count, per-partition row counts and timing
  as lineage — the north rule's "resumable mid-iteration with
  per-partition lineage + metrics". :meth:`FixpointRunner.run` with
  ``resume=True`` restarts from the latest durable snapshot.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import TableLayer


@contextmanager
def fixpoint_conf(spark: SparkSession):
    """Disable AQE for the duration of a fixpoint loop (round 6).

    Every iteration here is a short, fully hinted query (shuffle_hash
    joins, explicit repartition on the message key) whose shape is pinned
    by tests/test_plan_shape.py — there is nothing left for AQE to decide,
    but its per-stage re-optimization still costs serial driver work on
    EVERY exchange of EVERY iteration. Measured (interleaved A/B, same
    JVM, sf0.1): pagerank_1e6 10.1 → 8.0 s min-of-4, cc_labelprop and
    lpa ~15-20% — and the cost class is per-iteration driver latency, the
    same scale-killer as the round-4 shuffle-metrics poll, so the win
    grows with iteration count, not with local core count. Verified at
    18M edges too (OPTIMIZATION_r06.md).

    AQE's in-loop value would be runtime skew-join splitting; the loops'
    joins are degree-bounded or salted by construction (see each
    operator's skew notes). Deployments that want it anyway set
    SPARK_GRAFT_LOOP_AQE=1 — one-shot (non-loop) queries keep the
    session's AQE either way. Nested loops (scc's LP calls inside its own
    scope) see AQE already off and no-op, restoring correctly."""
    if os.environ.get("SPARK_GRAFT_LOOP_AQE", "0") == "1":
        yield
        return
    try:
        old = spark.conf.get("spark.sql.adaptive.enabled")
    except Exception:  # noqa: BLE001 — conf unreadable: leave it alone
        old = None
    if old != "true":
        yield
        return
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


@dataclass
class IterationMetrics:
    iteration: int
    changed: int
    seconds: float
    snapshot: int | None = None
    extra: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        d = {
            "iteration": self.iteration,
            "changed": self.changed,
            "seconds": self.seconds,
            "snapshot": self.snapshot,
        }
        d.update(self.extra)
        return d


class ShuffleMeter:
    """Incremental cumulative (shuffle read bytes, shuffle write bytes) from
    the JVM app-status store — the raw material for the reference's
    per-iteration comm/compute split (its MPI harness prints local-compute
    vs Alltoallv percentages per run,
    /root/reference/src/mpi/cc_mpi.c:2309-2330; here the shuffle IS the
    Alltoallv).

    Why incremental: ``statusStore().stageList(...)`` costs ~0.5 ms of py4j
    round-trips PER STAGE (measured), and a naive sum-over-all-stages poll
    therefore grows linearly with everything the app has ever run — on a
    multi-query session the per-iteration poll reached seconds and showed
    up as a wall-clock regression in the stage-heaviest query (round-4
    PageRank, BENCH_r04 16.2s vs r3 14.5s; the round-5 A/B pinned it on
    this poll). ``stageList`` returns stages NEWEST-FIRST (descending
    stageId, verified empirically), so the meter walks only until the first
    stage it has already finalized and keeps running totals Python-side:
    O(stages since last poll) per call, and — because finalized stages'
    bytes are remembered here — the cumulative total stays monotone even
    when the store evicts old stages (spark.ui.retainedStages can stay at
    its small default).

    Status events post asynchronously, so the listener bus is drained
    first; per-iteration deltas are diagnostics, not billing.
    """

    _FINAL = frozenset({"COMPLETE", "FAILED", "SKIPPED"})

    def __init__(self) -> None:
        self._final_read = 0
        self._final_write = 0
        # stages seen but not yet in a terminal state: id -> (read, write)
        self._active: dict[int, tuple[int, int]] = {}
        # every stageId <= floor is fully accounted in the final sums;
        # _finalized holds the (few) already-summed terminal ids ABOVE the
        # floor (a still-running stage can have a lower id than completed
        # ones — the floor can only rise past it once it finishes)
        self._floor = -1
        self._finalized: set[int] = set()

    def totals(self, spark: SparkSession, drain: bool = False) -> tuple[int, int] | None:
        """``drain=True`` waits for the async listener bus first — exact
        up-to-the-last-job totals, at a measured ~60 ms per call on a busy
        bus. The per-iteration loop polls WITHOUT draining (round 6):
        events that land late are simply attributed to the next poll, the
        cumulative totals stay correct, and per-iteration deltas are
        documented as diagnostics, not billing. End-of-run callers that
        want exact totals pass drain=True."""
        try:
            sc = spark.sparkContext
            if drain:
                try:
                    sc._jsc.sc().listenerBus().waitUntilEmpty()
                except Exception:  # noqa: BLE001 — drain is best-effort
                    pass
            jvm, gw = sc._jvm, sc._gateway
            stages = sc._jsc.sc().statusStore().stageList(
                jvm.java.util.ArrayList(), False, False,
                gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
            )
            seen: dict[int, tuple[str, int, int]] = {}
            it = stages.iterator()
            while it.hasNext():
                s = it.next()
                sid = s.stageId()
                if sid <= self._floor:
                    break  # newest-first: everything below is accounted
                if sid in self._finalized:
                    continue  # terminal and already summed
                # multiple attempts share a stageId; keep the max-bytes one
                # (retries re-run the same work; summing would double-count)
                st = s.status().toString()
                r, w = s.shuffleReadBytes(), s.shuffleWriteBytes()
                if sid in seen:
                    pr = seen[sid]
                    if r + w <= pr[1] + pr[2]:
                        continue
                seen[sid] = (st, r, w)
            # stages evicted from the store while still active: freeze at
            # their last observed values
            for sid, (r, w) in list(self._active.items()):
                if sid not in seen:
                    self._final_read += r
                    self._final_write += w
                    self._finalized.add(sid)
                    del self._active[sid]
            for sid, (st, r, w) in seen.items():
                if st in self._FINAL:
                    self._final_read += r
                    self._final_write += w
                    self._finalized.add(sid)
                    self._active.pop(sid, None)
                else:
                    self._active[sid] = (r, w)
            if self._active:
                self._floor = min(self._active) - 1
            elif self._finalized:
                self._floor = max(self._finalized)
            self._finalized = {i for i in self._finalized if i > self._floor}
            read = self._final_read + sum(r for r, _ in self._active.values())
            write = self._final_write + sum(w for _, w in self._active.values())
            return read, write
        except Exception:  # noqa: BLE001 — internal API; never fail the loop
            return None


def _shuffle_totals(spark: SparkSession) -> tuple[int, int] | None:
    """One-shot full-scan variant (sums every retained stage). Kept for
    callers without a live meter; loops should use :class:`ShuffleMeter`."""
    return ShuffleMeter().totals(spark, drain=True)


def _partition_histogram(df: DataFrame) -> list[int]:
    """Rows per partition — the per-partition lineage recorded at each
    durable snapshot (and the skew diagnostic: a straggler partition
    shows up as an outlier row count)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("p")).count().orderBy("p").collect()
    )
    return [r["count"] for r in rows]


def task_skew_report(
    spark: SparkSession, min_tasks: int = 4, min_stage_ms: int = 500
) -> list[dict]:
    """Per-stage task-runtime skew from the app-status store:
    [{stage_id, tasks, p50_ms, max_ms, ratio}] for completed stages with
    ≥ ``min_tasks`` tasks and max task time ≥ ``min_stage_ms`` (tiny
    stages are all scheduler noise). ``ratio = max/p50`` is the straggler
    diagnostic the reference's pthread harness prints as per-thread work
    imbalance (/root/reference/src/pthreads/afforest_simple.c:622-649);
    here a hub key that defeats the partitioner shows up as one long task
    on the exchange stage. Best-effort internal API: returns [] if
    unavailable."""
    try:
        sc = spark.sparkContext
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:  # noqa: BLE001
            pass
        jvm, gw = sc._jvm, sc._gateway
        store = sc._jsc.sc().statusStore()
        stages = store.stageList(
            jvm.java.util.ArrayList(), False, False,
            gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )
        q = gw.new_array(jvm.double, 2)
        q[0], q[1] = 0.5, 1.0
        out = []
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            if s.numCompleteTasks() < min_tasks:
                continue
            summ = store.taskSummary(s.stageId(), s.attemptId(), q)
            if not summ.isDefined():
                continue
            rt = summ.get().executorRunTime()
            p50, mx = float(rt.apply(0)), float(rt.apply(1))
            if mx < min_stage_ms:
                continue
            out.append(
                {
                    "stage_id": s.stageId(),
                    "tasks": s.numCompleteTasks(),
                    "p50_ms": p50,
                    "max_ms": mx,
                    "ratio": mx / max(p50, 1.0),
                }
            )
        return sorted(out, key=lambda r: -r["ratio"])
    except Exception:  # noqa: BLE001 — diagnostics must never fail the job
        return []


class FixpointRunner:
    """Drive ``state = step(state)`` to convergence.

    ``step_fn(state, iteration) -> (new_state, changed, extra_metrics)``;
    convergence is ``changed == 0``. The runner owns persistence:
    algorithms stay pure dataflow.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        checkpoint_dir: str | None = None,
        snapshot_every: int = 5,
        max_iterations: int = 200,
        record_partition_lineage: bool = True,
        raise_on_cap: bool = True,
        record_shuffle_bytes: bool | None = None,
    ):
        if record_shuffle_bytes is None:
            # env kill-switch: lets a fresh-JVM A/B quantify the metric's
            # own overhead (measured ~0 — see BENCH/BASELINE.md)
            record_shuffle_bytes = (
                os.environ.get("SPARK_GRAFT_SHUFFLE_METRICS", "1") != "0"
            )
        self.spark = spark
        self.name = name
        self.tables = TableLayer(spark, checkpoint_dir) if checkpoint_dir else None
        self.snapshot_every = snapshot_every
        self.max_iterations = max_iterations
        self.record_partition_lineage = record_partition_lineage
        self.raise_on_cap = raise_on_cap
        self.record_shuffle_bytes = record_shuffle_bytes
        self.metrics: list[IterationMetrics] = []

    # -- persistence -------------------------------------------------------
    def _save(self, state: DataFrame, it: int, m: IterationMetrics) -> int:
        lineage = {
            "iteration": it,
            "changed": m.changed,
            "seconds": m.seconds,
            "num_partitions": state.rdd.getNumPartitions(),
            **m.extra,
        }
        if self.record_partition_lineage:
            lineage["partition_rows"] = _partition_histogram(state)
        return self.tables.save_snapshot(self.name, state, lineage=lineage)

    def latest(self) -> tuple[DataFrame, int] | None:
        """(state, iteration) of the latest durable snapshot, or None."""
        if self.tables is None or self.tables.latest_snapshot(self.name) < 0:
            return None
        snaps = self.tables.snapshots(self.name)
        it = snaps[-1]["lineage"].get("iteration", 0)
        return self.tables.load(self.name), it

    # -- the loop ----------------------------------------------------------
    def run(
        self,
        init_state: DataFrame | Callable[[], DataFrame],
        step_fn: Callable[[DataFrame, int], DataFrame],
        converged_fn: Callable[[DataFrame, int], tuple[int, dict]],
        resume: bool = False,
    ) -> DataFrame:
        """``step_fn(state, it)`` returns the next state as a *lazy* plan;
        the runner materializes it (lineage truncation) exactly once, then
        ``converged_fn(new_state, it)`` computes ``(changed, extra)`` over
        the materialized state — so convergence actions never recompute
        the iteration's dataflow."""
        start_iter = 0
        state: DataFrame | None = None
        if resume:
            got = self.latest()
            if got is not None:
                state, start_iter = got
                start_iter += 1
        if state is None:
            state = init_state() if callable(init_state) else init_state
            state = state.localCheckpoint(eager=True)

        prev = None
        meter = ShuffleMeter() if self.record_shuffle_bytes else None
        shuffle0 = meter.totals(self.spark) if meter is not None else None
        with fixpoint_conf(self.spark):
            for it in range(start_iter, self.max_iterations):
                t0 = time.perf_counter()
                # NOTE: with AQE off (fixpoint_conf), localCheckpoint
                # PRESERVES the state's output partitioning (LogicalRDD
                # captures the physical plan's partitioning; only under
                # AQE does it report UnknownPartitioning) — so a state
                # materialized hash(vertex)-partitioned stays recognized
                # as co-partitioned with the pinned edge table and the
                # aggregation output in the next iteration's plan, while
                # still truncating lineage every iteration.
                new_state = step_fn(state, it).localCheckpoint(eager=True)
                changed, extra = converged_fn(new_state, it)
                if prev is not None:
                    prev.unpersist()
                prev, state = state, new_state
                # Poll the meter every few iterations plus at convergence
                # (round 6): each poll costs ~20-40 ms of py4j round-trips
                # even incrementally, a per-iteration driver tax on loops
                # whose whole iteration is ~0.4 s. Cumulative totals stay
                # exact; the per-entry deltas become per-poll-window
                # aggregates (attributed to the polling iteration), which
                # is fine for a diagnostic.
                if shuffle0 is not None and (
                    changed == 0 or (it - start_iter) % 4 == 3
                ):
                    shuffle1 = meter.totals(self.spark)
                    if shuffle1 is not None:
                        # Clamp: the meter's running totals are monotone even
                        # under status-store eviction (finalized stages' bytes
                        # are remembered Python-side), but the diagnostic must
                        # never go negative regardless.
                        extra = dict(
                            extra,
                            shuffle_read_bytes=max(0, shuffle1[0] - shuffle0[0]),
                            shuffle_write_bytes=max(0, shuffle1[1] - shuffle0[1]),
                        )
                        shuffle0 = shuffle1
                m = IterationMetrics(it, changed, time.perf_counter() - t0, extra=extra)
                if self.tables is not None and (
                    changed == 0 or (it + 1) % self.snapshot_every == 0
                ):
                    m.snapshot = self._save(state, it, m)
                self.metrics.append(m)
                if changed == 0:
                    break
            else:
                if self.raise_on_cap:
                    raise RuntimeError(
                        f"{self.name}: no convergence in {self.max_iterations} iterations"
                        " (cap analog: /root/reference/src/cc_openmp.c:82)"
                    )
        return state

    @property
    def num_iterations(self) -> int:
        """CCResult.num_iterations analog (/root/reference/inc/cc_sequential.h:8).

        Counts engine iterations only: diagnostic marker rows (recorded
        with ``changed == -1``, e.g. Afforest's giant-sample vote) are
        excluded so the count is comparable across ``--algorithm``
        choices. Multi-phase algorithms additionally report per-phase
        counts in :attr:`phase_iterations`."""
        return sum(1 for m in self.metrics if m.changed >= 0)

    @property
    def phase_iterations(self) -> dict[str, int]:
        """Iteration count per phase (``extra["phase"]`` tag; untagged
        metrics count under ``"main"``). Diagnostic rows excluded."""
        out: dict[str, int] = {}
        for m in self.metrics:
            if m.changed < 0:
                continue
            key = m.extra.get("phase", "main")
            out[key] = out.get(key, 0) + 1
        return out
