"""HTTP arbiter adapter (r10): the network-auth deployment transport.

The manager transport (arbiter_server) proved cross-process exclusion;
this suite proves the same commit contract over an AUTHENTICATED HTTP
service with real network failure modes: 401 on bad credentials (loud
config error, never retried as unavailability), 409 for definite CAS
loss, 503 for service outage, and — the case no proxy can fake — a REAL
socket timeout where the server applied the CAS and the client's read
timed out, resolved exactly-once by the writer-side reconciliation.
"""

from __future__ import annotations

import threading

import pytest

from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming import (
    partitioned_upsert as pu,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.http_arbiter import (
    HttpArbiterServer,
    HttpCommitArbiter,
)
from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.logstore import (
    ArbiterLogStore,
    ArbiterUnavailableError,
    ConcurrentCommitError,
)

TOKEN = "test-token-r10"


@pytest.fixture()
def http_server():
    srv = HttpArbiterServer(TOKEN).start()
    try:
        yield srv
    finally:
        srv.shutdown()


def _client(srv, timeout_s=10.0, token=TOKEN):
    host, port = srv.address
    return HttpCommitArbiter(f"http://{host}:{port}", token, timeout_s=timeout_s)


def _payload(batch_id: int) -> dict:
    return {"batch_id": batch_id, "range_width": 16, "buckets": {}, "stats": {}}


def test_contract_matrix_one_winner_per_basis_over_http(
    spark, tmp_path, http_server
):
    """Racing writers through two independent HTTP clients: exactly one
    winner per basis; losers get 409 -> ConcurrentCommitError and
    publish nothing visible."""
    a = ArbiterLogStore(_client(http_server))
    b = ArbiterLogStore(_client(http_server))
    mdir = str(tmp_path / "state" / "manifests")
    a.commit(spark, mdir, "v000000000", _payload(0), expected=None)
    basis = tuple(b.list_commits(spark, mdir))
    assert basis == ("v000000000",)

    outcomes: list[str] = []
    guard = threading.Lock()

    def writer(k: int, store: ArbiterLogStore) -> None:
        try:
            store.commit(spark, mdir, f"v00000000{k}", _payload(k), expected=basis)
            with guard:
                outcomes.append("ok")
        except ConcurrentCommitError:
            with guard:
                outcomes.append("rejected")

    ts = [
        threading.Thread(target=writer, args=(k, a if k % 2 else b))
        for k in range(1, 7)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert outcomes.count("ok") == 1, outcomes
    assert len(a.list_commits(spark, mdir)) == 2


def test_bad_token_is_a_loud_config_error(spark, tmp_path, http_server):
    """401 must surface as PermissionError, not as retryable
    unavailability — retrying a credential failure masks the bug."""
    good = ArbiterLogStore(_client(http_server))
    mdir = str(tmp_path / "state" / "manifests")
    good.commit(spark, mdir, "v000000000", _payload(0), expected=None)
    bad = ArbiterLogStore(_client(http_server, token="wrong"))
    with pytest.raises(PermissionError, match="credentials"):
        bad.commit(
            spark, mdir, "v000000001", _payload(1),
            expected=("v000000000",),
        )
    # nothing recorded: the next legitimate commit sails through
    good.commit(
        spark, mdir, "v000000001", _payload(1), expected=("v000000000",)
    )


def test_server_outage_maps_to_unavailable(spark, tmp_path, http_server):
    """An injected server-side outage surfaces as 503 ->
    ArbiterUnavailableError through the HTTP client."""
    store = ArbiterLogStore(_client(http_server))
    mdir = str(tmp_path / "state" / "manifests")
    store.commit(spark, mdir, "v000000000", _payload(0), expected=None)
    http_server.arbiter.fail_next(1)
    with pytest.raises(ConcurrentCommitError):
        # the append-path reconciliation converts the 503 into the
        # retry-safe conflict (nothing landed server-side)
        pu_store = pu.set_log_store(store)
        try:
            pu.append_delta_batch(
                spark,
                str(tmp_path / "state"),
                spark.createDataFrame([(1, 1.0)], "key long, amount double"),
                1,
                range_width=16,
            )
        finally:
            pu.set_log_store(pu_store)


def test_real_socket_timeout_after_applied_cas_reconciles_exactly_once(
    spark, tmp_path
):
    """THE network case the manager proxy cannot produce: the server
    applies the CAS, then sleeps past the client's socket timeout on the
    response leg. The writer sees a timeout (outcome unknown), and the
    reconciliation — whose reads are NOT delayed — finds its own attempt
    committed: success, exactly once, no duplicate append."""
    srv = HttpArbiterServer(TOKEN, latency_s=2.0).start()
    try:
        flaky = ArbiterLogStore(_client(srv, timeout_s=0.5))
        prev = pu.set_log_store(flaky)
        try:
            state = str(tmp_path / "state")
            df0 = spark.createDataFrame([(1, 1.0)], "key long, amount double")
            # bootstrap commit goes through record() (no latency injected)
            pu.append_delta_batch(spark, state, df0, 0, range_width=16)
            # this commit's cas APPLIES server-side; the response times out
            pu.append_delta_batch(
                spark,
                state,
                spark.createDataFrame([(2, 2.0)], "key long, amount double"),
                1,
                range_width=16,
            )
            got = {
                r["key"]: (r["total"], r["n_rows"])
                for r in pu.read_latest_partitioned_state(spark, state).collect()
            }
            assert got == {1: (1.0, 1), 2: (2.0, 1)}
        finally:
            pu.set_log_store(prev)
    finally:
        srv.shutdown()


def test_crash_between_cas_and_finalize_self_heals_over_http(
    spark, tmp_path, http_server, monkeypatch
):
    """A writer that dies after winning the CAS leaves a pending record;
    another HTTP client's read finishes the finalize from the staged
    file — the Delta complete=false recovery, over the network path."""
    a = ArbiterLogStore(_client(http_server))
    b = ArbiterLogStore(_client(http_server))
    mdir = str(tmp_path / "state" / "manifests")
    a.commit(spark, mdir, "v000000000", _payload(0), expected=None)

    def crash(*args, **kw):
        raise IOError("injected crash before finalize")

    monkeypatch.setattr(a, "_finalize", crash)
    with pytest.raises(IOError, match="injected crash"):
        a.commit(
            spark, mdir, "v000000001", _payload(1), expected=("v000000000",)
        )
    healed = b.list_commits(spark, mdir)
    assert healed == ["v000000000", "v000000001"]
    assert b.read_commit(spark, mdir, "v000000001")["batch_id"] == 1


def test_env_wiring_selects_http_client(monkeypatch, http_server):
    """SPARK_GRAFT_ARBITER_ENDPOINT=http://... builds the HTTP client
    with the env token and timeout."""
    from pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.arbiter_server import (
        arbiter_store_from_env,
    )

    host, port = http_server.address
    monkeypatch.setenv("SPARK_GRAFT_ARBITER_ENDPOINT", f"http://{host}:{port}")
    monkeypatch.setenv("SPARK_GRAFT_ARBITER_AUTHKEY", TOKEN)
    monkeypatch.setenv("SPARK_GRAFT_ARBITER_TIMEOUT_S", "3.5")
    store = arbiter_store_from_env()
    arb = store.arbiter
    assert isinstance(arb, HttpCommitArbiter)
    assert arb._timeout_s == 3.5
    # a live round trip through the env-built client
    arb.seed("t", ["v000000000"])
    assert arb.records("t") == {"v000000000": None}


def test_protocol_errors_are_loud_not_retryable(http_server):
    """500 (server-side exception, e.g. an argument-shape mismatch from
    client/server version skew) is deterministic — mapping it to
    'unavailable' would send the optimistic loop into max_attempts of
    doomed retries, burning staged deltas against the same bug. It must
    surface as a RuntimeError naming the status, not as
    ArbiterUnavailableError."""
    c = _client(http_server)
    # missing required argument reaches the server and raises a
    # TypeError inside the dispatch -> 500 -> loud protocol error
    with pytest.raises(RuntimeError, match="protocol error HTTP 500"):
        c._call("records")


def test_token_compare_is_constant_time(http_server):
    """The bearer check must go through hmac.compare_digest (r10 VERDICT
    nit): a plain == leaks match-prefix timing to anyone who can reach
    the socket. Pin the implementation AND prove auth still works both
    ways through a live round trip."""
    import inspect

    import pharmaceutical_sales_data_etl_analysis_pipeline_spark.streaming.http_arbiter as ha

    src = inspect.getsource(ha.HttpArbiterServer.__init__)
    assert "hmac.compare_digest" in src
    # correct token: live round trip succeeds
    good = _client(http_server)
    good.seed("ct", ["v000000000"])
    assert good.records("ct") == {"v000000000": None}
    # wrong token (same length — the case a naive length check passes):
    # still 401
    with pytest.raises(PermissionError):
        _client(http_server, token="X" * len(TOKEN)).records("ct")


def test_standalone_launcher_serves_and_requires_token(tmp_path):
    """The __main__ launcher is the deployment artifact: it refuses to
    start without a token, prints its bound endpoint as one JSON line,
    and a client round-trips through the spawned process."""
    import json as _json
    import os as _os
    import signal as _signal
    import subprocess as _sp
    import sys as _sys
    import time as _time

    mod = (
        "pharmaceutical_sales_data_etl_analysis_pipeline_spark"
        ".streaming.http_arbiter"
    )
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    # no token -> refuses
    r = _sp.run(
        [_sys.executable, "-m", mod],
        env={k: v for k, v in _os.environ.items()
             if k != "SPARK_GRAFT_ARBITER_AUTHKEY"},
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode != 0 and "AUTHKEY" in (r.stderr + r.stdout)

    # with token -> serves; client round-trips
    proc = _sp.Popen(
        [_sys.executable, "-m", mod, "127.0.0.1", "0"],
        env={**_os.environ, "SPARK_GRAFT_ARBITER_AUTHKEY": "launch-tok"},
        cwd=repo,
        stdout=_sp.PIPE,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        endpoint = _json.loads(line)["endpoint"]
        c = HttpCommitArbiter(endpoint, "launch-tok", timeout_s=10)
        c.seed("t", ["v000000000"])
        assert c.records("t") == {"v000000000": None}
        with pytest.raises(PermissionError):
            HttpCommitArbiter(endpoint, "wrong", timeout_s=10).records("t")
    finally:
        proc.send_signal(_signal.SIGTERM)
        assert proc.wait(timeout=30) == 0


def test_standalone_launcher_journal_compaction_env_wiring(tmp_path):
    """r13: the launcher wires SPARK_GRAFT_ARBITER_COMPACT_FACTOR /
    _COMPACT_MIN_BYTES into the journalled arbiter. With tiny thresholds
    a churn workload (record -> forget) must leave a COMPACTED journal on
    disk — far fewer lines than mutations — and a relaunch replays the
    live state from it. FACTOR=0 must disable (journal stays the raw
    mutation log)."""
    import json as _json
    import os as _os
    import signal as _signal
    import subprocess as _sp
    import sys as _sys

    mod = (
        "pharmaceutical_sales_data_etl_analysis_pipeline_spark"
        ".streaming.http_arbiter"
    )
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    def churn(env_extra: dict) -> tuple[int, int]:
        """Run 40 record+forget cycles + one survivor; return
        (journal_lines, replayed_entries_on_relaunch)."""
        jp = str(tmp_path / f"j_{len(env_extra)}.wal")
        env = {
            **_os.environ,
            "SPARK_GRAFT_ARBITER_AUTHKEY": "tok",
            "SPARK_GRAFT_ARBITER_JOURNAL": jp,
            **env_extra,
        }
        proc = _sp.Popen(
            [_sys.executable, "-m", mod, "127.0.0.1", "0"],
            env=env, cwd=repo, stdout=_sp.PIPE, text=True,
        )
        try:
            endpoint = _json.loads(proc.stdout.readline())["endpoint"]
            c = HttpCommitArbiter(endpoint, "tok", timeout_s=10)
            c.record("t", "vkeep", None)
            for i in range(40):
                c.record("t", f"v{i:09d}", None)
                c.forget("t", f"v{i:09d}")
            assert c.records("t") == {"vkeep": None}
        finally:
            proc.send_signal(_signal.SIGTERM)
            assert proc.wait(timeout=30) == 0
        lines = sum(1 for _ in open(jp, "rb"))
        # relaunch: replay must reconstruct exactly the live state
        proc2 = _sp.Popen(
            [_sys.executable, "-m", mod, "127.0.0.1", "0"],
            env=env, cwd=repo, stdout=_sp.PIPE, text=True,
        )
        try:
            start = _json.loads(proc2.stdout.readline())
            c2 = HttpCommitArbiter(start["endpoint"], "tok", timeout_s=10)
            assert c2.records("t") == {"vkeep": None}
            return lines, start["replayed_entries"]
        finally:
            proc2.send_signal(_signal.SIGTERM)
            assert proc2.wait(timeout=30) == 0

    lines_on, replayed_on = churn(
        {
            "SPARK_GRAFT_ARBITER_COMPACT_MIN_BYTES": "256",
            "SPARK_GRAFT_ARBITER_COMPACT_FACTOR": "1.5",
        }
    )
    lines_off, replayed_off = churn({"SPARK_GRAFT_ARBITER_COMPACT_FACTOR": "0"})
    assert lines_off == 81  # raw mutation log: 41 records + 40 forgets
    assert lines_on < 20  # compacted snapshot + tail
    assert replayed_on >= 1 and replayed_off == 81
