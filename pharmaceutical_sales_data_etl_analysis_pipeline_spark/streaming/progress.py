"""One shared StreamingQueryListener for progress accounting.

Every fixture query, ingest path, and rung that drives a stream needs
the same three things, and `q.recentProgress` provides none of them
reliably (it is a ring buffer capped at
spark.sql.streaming.numRecentProgressUpdates, default 100 — idle batches
under ProcessingTimeTimeout evict the data batches' entries):

  * per-batch progress rows (input rows, trigger wall, state-store
    size/evictions), deduplicated by (query id, batch id) so a replayed
    epoch reports once;
  * a cumulative input-row count to decide when a fixture's publish has
    fully drained;
  * a termination signal that accounts for listener callbacks arriving
    on their own thread — awaitTermination() returning does NOT mean the
    final progress events were delivered yet.

Before r10 this was hand-copied in three places (the MoR ingest
collector, the session-fixture input counter, and the rung collectors),
each carrying a subset of the semantics; a fix to one — like the
termination-Event race handling — had to be re-found in the others.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLog(StreamingQueryListener):
    """Lock-guarded accumulator of every progress event on the session.

    Register with spark.streams.addListener BEFORE starting the query,
    filter by query id afterwards (events for other queries on the same
    session interleave), and ALWAYS removeListener in a finally block —
    a leaked listener keeps accumulating across later queries."""

    def __init__(self):
        # (query id, batch id) -> fields; insertion-ordered, replays of a
        # batch id overwrite in place so the batch sequence stays exact
        self._rows: dict[tuple[str, int], dict] = {}
        self._terminated: dict[str, threading.Event] = {}
        self._guard = threading.Lock()

    # -- listener callbacks (run on the listener bus thread) -----------
    def onQueryStarted(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        ops = json.loads(p.json).get("stateOperators", [])
        with self._guard:
            self._rows[(str(p.id), p.batchId)] = {
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "trigger_s": p.durationMs.get("triggerExecution", 0) / 1000.0,
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "state_removed": sum(o.get("numRowsRemoved", 0) for o in ops),
            }

    def onQueryTerminated(self, event):
        with self._guard:
            ev = self._terminated.setdefault(str(event.id), threading.Event())
        ev.set()

    # -- consumer API --------------------------------------------------
    def batches(self, query_id: str) -> list[dict]:
        """This query's per-batch rows in batch order (deduplicated)."""
        with self._guard:
            return [d for (i, _b), d in self._rows.items() if i == query_id]

    def input_rows(self, query_id: str) -> int:
        """Total input rows delivered to this query so far."""
        with self._guard:
            return sum(
                d["input_rows"]
                for (i, _b), d in self._rows.items()
                if i == query_id
            )

    def wait_terminated(self, query_id: str, timeout_s: float) -> bool:
        """Block until the termination CALLBACK arrived (not merely until
        awaitTermination returned). False = the tail of the progress list
        may be missing — callers should surface that, not guess."""
        with self._guard:
            ev = self._terminated.setdefault(query_id, threading.Event())
        return ev.wait(timeout=timeout_s)
