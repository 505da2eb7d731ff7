"""Back-pressure accounting + prediction (SURVEY.md §2.11).

The reference enables NiFi's analytics back-pressure *prediction*
(``NIFI_ANALYTICS_PREDICT_ENABLED: "true"`` —
nifi2/nifi-deployment3-working.yaml:22): NiFi fits a model over queue
growth to predict when a connection saturates.  Spark has no engine
backlog (sources are rate-capped via maxFilesPerTrigger /
maxOffsetsPerTrigger), so the analog watches StreamingQueryProgress:
backlog pressure = input rate minus processed rate; a least-squares fit
over its history predicts saturation the same way.  Driver-side, O(number
of progress events) — never touches data.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["BackpressureMonitor"]


class BackpressureMonitor(StreamingQueryListener):
    """Collects per-batch progress and fits backlog growth.

    Register with ``spark.streams.addListener(monitor)``; after (or
    during) a run, ``pressure_slope()`` is the fitted rows/sec² of
    (input - processed) — positive and sustained means the pipeline is
    falling behind and the source cap or parallelism needs adjusting.
    """

    def __init__(self) -> None:
        self.history: list[tuple[float, float, float]] = []  # (t_sec, in_rps, proc_rps)

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.history.append(
            (
                p.batchId,
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    # analytics --------------------------------------------------------
    def pressure_slope(self) -> float:
        """Least-squares slope of (input − processed) rows/sec over batch
        id — the NiFi-analytics-style saturation predictor.  0.0 until
        two batches of history exist."""
        if len(self.history) < 2:
            return 0.0
        xs = [t for t, _, _ in self.history]
        ys = [i - p for _, i, p in self.history]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        if denom == 0:
            return 0.0
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom

    def backlog_pressure(self) -> float:
        """Latest (input − processed) rows/sec; > 0 means falling behind."""
        if not self.history:
            return 0.0
        _, i, p = self.history[-1]
        return i - p
