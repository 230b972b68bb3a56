"""Declarative runtime data-quality gates.

Reference analogue: the YAML-driven test framework that runs mandatory /
optional assertions between every pipeline stage —
/root/reference/etl/plugins/operators/test.py:45-64 (mandatory failure
aborts the DAG run, optional failure warns),
/root/reference/etl/dags/lib/test_framework.py:23-98 (declarative spec →
SQL → compare against expectation), and e.g.
include/tests/user_history/mandatory/base.yaml:1-154,
include/tests/load_sensor/mandatory/load_atomic.yaml:13 (geo-null
< 0.1 %), include/tests/event_transformations/optional/event_loss.yaml:52
(loss ≤ 2 %).

Spark-first shape: every check is an *aggregate expression*, so a whole
gate evaluates in ONE pass — either standalone (``gate.evaluate(df)``,
one job) or for free inside the CDC apply, riding the same
``Observation`` as the lineage metrics (zero extra passes over the
batch; the gate verdict lands between the data write and the metadata
commit, so a mandatory violation blocks the commit and leaves only an
unreferenced directory for vacuum).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MANDATORY = "mandatory"
OPTIONAL = "optional"

_OPS = {
    "<=": lambda m, t: m <= t,
    ">=": lambda m, t: m >= t,
    "<": lambda m, t: m < t,
    ">": lambda m, t: m > t,
    "==": lambda m, t: m == t,
}


@dataclass
class Check:
    """One declarative assertion.

    Either ``violation`` (a row-level boolean; measured value = violating
    fraction of rows, 0..1) or ``metric`` (an aggregate Column; measured
    value = the aggregate itself) must be set. The check passes iff
    ``measured <op> threshold``.
    """

    name: str
    level: str
    op: str
    threshold: float
    violation: Column | None = None
    metric: Column | None = None
    description: str = ""

    def observe_col(self, row_filter: Column | None = None) -> Column:
        """The single aggregate expression that measures this check.

        ``row_filter`` scopes row-level (fraction) checks to a subset —
        the CDC apply passes ``op <> 'D'`` so delete events' NULL payloads
        don't read as quality violations. Metric checks are unscoped (the
        caller owns their expression)."""
        if (self.violation is None) == (self.metric is None):
            raise ValueError(f"check {self.name}: set exactly one of violation/metric")
        if self.violation is not None:
            v = self.violation
            if row_filter is not None:
                num = F.sum(F.when(row_filter & v, 1).otherwise(0))
                den = F.sum(F.when(row_filter, 1).otherwise(0))
            else:
                num = F.sum(F.when(v, 1).otherwise(0))
                den = F.count(F.lit(1))
            col = num.cast("double") / F.greatest(den, F.lit(1)).cast("double")
        else:
            col = self.metric
        return col.cast("double").alias(f"q_{self.name}")

    def judge(self, measured: float | None) -> bool:
        if measured is None:
            return False  # unmeasurable (e.g. empty input for a metric) fails
        return _OPS[self.op](measured, self.threshold)


# -- constructors mirroring the reference's spec vocabulary ------------------


def null_fraction(col: str, max_frac: float, level: str = MANDATORY) -> Check:
    """≤ max_frac NULLs (reference load_atomic.yaml:13 geo-null < 0.1%)."""
    return Check(
        name=f"null_frac_{col}", level=level, op="<=", threshold=max_frac,
        violation=F.col(col).isNull(),
        description=f"fraction of NULL {col} <= {max_frac}",
    )


def accepted_values(
    col: str, values: list, max_frac: float = 0.0, level: str = MANDATORY
) -> Check:
    """Values outside the accepted set ≤ max_frac (NULL doesn't count —
    pair with null_fraction for that)."""
    return Check(
        name=f"accepted_{col}", level=level, op="<=", threshold=max_frac,
        violation=F.col(col).isNotNull() & ~F.col(col).isin(values),
        description=f"{col} in {values}",
    )


def value_range(
    col: str, lo=None, hi=None, max_frac: float = 0.0, level: str = MANDATORY
) -> Check:
    v = F.lit(False)
    if lo is not None:
        v = v | (F.col(col) < F.lit(lo))
    if hi is not None:
        v = v | (F.col(col) > F.lit(hi))
    return Check(
        name=f"range_{col}", level=level, op="<=", threshold=max_frac,
        violation=F.col(col).isNotNull() & v,
        description=f"{col} within [{lo}, {hi}]",
    )


def min_rows(n: int, level: str = MANDATORY) -> Check:
    """Row count ≥ n (reference mandatory count tests — an empty stage
    output is a pipeline failure, not a quiet no-op)."""
    return Check(
        name="min_rows", level=level, op=">=", threshold=float(n),
        metric=F.count(F.lit(1)), description=f"rows >= {n}",
    )


def fraction_check(
    name: str, violation: Column, max_frac: float, level: str = MANDATORY,
    description: str = "",
) -> Check:
    """Generic row-level rule: violating fraction ≤ max_frac (the shape of
    the reference's event-loss ≤ 2% optional test)."""
    return Check(name=name, level=level, op="<=", threshold=max_frac,
                 violation=violation, description=description)


def metric_check(
    name: str, metric: Column, op: str, threshold: float,
    level: str = MANDATORY, description: str = "",
) -> Check:
    """Generic aggregate rule (arbitrary SQL aggregate vs expectation —
    the reference test framework's fully general case)."""
    return Check(name=name, level=level, op=op, threshold=threshold,
                 metric=metric, description=description)


# -- evaluation ---------------------------------------------------------------


@dataclass
class CheckResult:
    name: str
    level: str
    measured: float | None
    op: str
    threshold: float
    passed: bool
    description: str = ""

    def to_dict(self) -> dict:
        return {
            "name": self.name, "level": self.level, "measured": self.measured,
            "op": self.op, "threshold": self.threshold, "passed": self.passed,
        }


@dataclass
class GateReport:
    results: list[CheckResult] = field(default_factory=list)

    @property
    def mandatory_failures(self) -> list[CheckResult]:
        return [r for r in self.results if not r.passed and r.level == MANDATORY]

    @property
    def warnings(self) -> list[CheckResult]:
        return [r for r in self.results if not r.passed and r.level == OPTIONAL]

    @property
    def ok(self) -> bool:
        return not self.mandatory_failures

    def to_dict(self) -> dict:
        return {"ok": self.ok, "checks": [r.to_dict() for r in self.results]}

    def alert_rows(self, context: dict | None = None) -> list[dict]:
        """One structured alert record per FAILED check (both severities;
        the sink/operator routes on ``severity``)."""
        return [
            {
                "severity": r.level,
                "check": r.name,
                "measured": r.measured,
                "op": r.op,
                "threshold": r.threshold,
                "description": r.description,
                **(context or {}),
            }
            for r in self.results
            if not r.passed
        ]


class AlertSink:
    """Destination for gate-violation alerts (the reference routes
    mandatory failures to the DAG run and optional ones to warnings —
    plugins/operators/test.py:45-64; here both land as structured records
    and the severity field carries the routing)."""

    def emit(self, alerts: list[dict]) -> None:
        raise NotImplementedError


class JsonlAlertSink(AlertSink):
    """Lineage-style alerts table: JSONL next to the table, one row per
    violated check per batch, readable back as a DataFrame."""

    def __init__(self, path: str):
        import os

        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, alerts: list[dict]) -> None:
        import json
        import os
        import time

        if not alerts:
            return
        with open(self.path, "a") as f:
            for a in alerts:
                f.write(json.dumps({"at": time.time(), **a}, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def rows(self) -> list[dict]:
        import json
        import os

        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def to_df(self, spark):
        return spark.createDataFrame(self.rows())


class SloViolation(RuntimeError):
    """An engine-level service-level objective was breached (e.g. ingest
    lag over its deadline). Raised AFTER the offending commit — the data
    is durable; what failed is the freshness promise, so a mandatory SLO
    stops the drive loop for operator attention rather than undoing work."""

    def __init__(self, check: str, measured: float, threshold: float, context: str = ""):
        self.check, self.measured, self.threshold = check, measured, threshold
        super().__init__(
            f"SLO {check} breached{f' ({context})' if context else ''}: "
            f"measured {measured} > {threshold}"
        )


@dataclass
class LagSlo:
    """Ingest-freshness deadline over ``ApplyStats.ingest_lag_s`` (wall
    clock at commit minus the newest applied op_ts) — the engine analogue
    of the reference's 8-hour DeadlineSensor on the user_history DAG
    (/root/reference/etl/dags/user_history/DAG_user_history.py:98-105,
    plugins/operators/deadline.py:29-38).

    ``level=OPTIONAL`` (default): a breach emits a severity-tagged alert
    row and the drive loop proceeds. ``level=MANDATORY``: the alert is
    emitted AND ``SloViolation`` raises after the commit — the epoch's
    data is durable; the loop stops so an operator sees the stall instead
    of the table silently running hours behind its stream head.
    """

    max_lag_s: float
    level: str = OPTIONAL
    name: str = "ingest_lag_slo"

    def check(self, stats, sink: AlertSink | None = None,
              context: dict | None = None) -> bool:
        """Returns True when the SLO holds. Emits/raises on breach."""
        lag = getattr(stats, "ingest_lag_s", None)
        if lag is None or lag <= self.max_lag_s:
            return True
        if sink is not None:
            sink.emit([
                {
                    "severity": self.level,
                    "check": self.name,
                    "measured": lag,
                    "op": "<=",
                    "threshold": self.max_lag_s,
                    "description": "ingest lag over SLO deadline",
                    **(context or {}),
                }
            ])
        if self.level == MANDATORY:
            raise SloViolation(
                self.name, lag, self.max_lag_s,
                context=", ".join(f"{k}={v}" for k, v in (context or {}).items()),
            )
        return False


class GateFailure(RuntimeError):
    """A mandatory check failed; the stage's commit was blocked."""

    def __init__(self, report: GateReport, context: str = ""):
        self.report = report
        names = ", ".join(
            f"{r.name} (measured {r.measured!r}, want {r.op} {r.threshold})"
            for r in report.mandatory_failures
        )
        super().__init__(f"quality gate blocked {context or 'commit'}: {names}")


class QualityGate:
    """A named set of checks evaluated in one aggregate pass.

    ``sink`` (an ``AlertSink``) receives one structured record per failed
    check — optional violations alert WITHOUT blocking, mandatory ones
    alert AND block. The CDC engine attaches a JSONL sink next to the
    table's lineage log when the caller didn't provide one."""

    def __init__(self, checks: list[Check], name: str = "gate",
                 sink: AlertSink | None = None):
        self.checks = list(checks)
        self.name = name
        self.sink = sink

    def emit_alerts(
        self,
        report: GateReport,
        context: dict | None = None,
        default_sink: "AlertSink | None" = None,
    ) -> None:
        """Route failed-check alerts. ``default_sink`` is the caller's
        per-invocation destination, used only when the gate has no sink of
        its own — so a gate shared across engines/tables never gets one
        engine's sink baked in."""
        sink = self.sink if self.sink is not None else default_sink
        if sink is not None:
            sink.emit(report.alert_rows({"gate": self.name, **(context or {})}))

    def observe_cols(self, row_filter: Column | None = None) -> list[Column]:
        return [c.observe_col(row_filter) for c in self.checks]

    def report_from_metrics(self, metrics: dict) -> GateReport:
        """Build the verdict from an Observation/agg row's q_* values."""
        out = GateReport()
        for c in self.checks:
            m = metrics.get(f"q_{c.name}")
            m = float(m) if m is not None else None
            out.results.append(
                CheckResult(
                    name=c.name, level=c.level, measured=m, op=c.op,
                    threshold=c.threshold, passed=c.judge(m),
                    description=c.description,
                )
            )
        return out

    def evaluate(self, df: DataFrame, row_filter: Column | None = None) -> GateReport:
        """Standalone between-stage evaluation: one aggregation job."""
        row = df.agg(*self.observe_cols(row_filter)).first()
        return self.report_from_metrics(row.asDict())

    def enforce(self, df: DataFrame, context: str = "",
                row_filter: Column | None = None) -> GateReport:
        """Evaluate and raise ``GateFailure`` on any mandatory violation
        (the reference's between-stage mandatory test operator)."""
        report = self.evaluate(df, row_filter)
        if not report.ok:
            raise GateFailure(report, context)
        return report


def default_transcript_gate() -> QualityGate:
    """The stock gate for the transcripts CDC stream — the analogue of the
    reference's mandatory base.yaml suite, over this engine's payload."""
    return QualityGate(
        [
            null_fraction("conv_id", 0.0),
            null_fraction("turn_idx", 0.0),
            accepted_values("role", ["user", "assistant", "system", "tool"]),
            null_fraction("text", 0.001, level=OPTIONAL),
            value_range("turn_idx", lo=0, max_frac=0.0),
            min_rows(1),
        ],
        name="transcripts_default",
    )
