"""Wire-protocol tests: the reference client's exact socket semantics
(Backend/api/api.py:160-199) against EngineServer."""

from __future__ import annotations

import io
import json
import socket
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from exact_spark.plans.api import EngineAPI
from exact_spark.plans.wire import EngineServer


@pytest.fixture()
def server(spark, tmp_path):
    (tmp_path / "datasets").mkdir()
    api = EngineAPI(
        spark, str(tmp_path / "wh"), str(tmp_path / "out"),
        datasets_dir=str(tmp_path / "datasets"),
    )
    # a small job table: 50 rows, one per minute
    df = spark.range(1, 51).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("timestamp"),
        (F.col("id") * 1.5).alias("v1"),
        F.lit(0).alias("label"),
        F.lit(False).alias("injected_anomaly"),
        F.lit(False).alias("is_anomaly"),
    )
    api.catalog.create_table(api.catalog.table_name("wiredemo"), df)
    srv = EngineServer(api)
    srv.start()
    yield srv
    srv.stop()


def _request(srv, payload: dict, response: bool = True, second_message: bytes | None = None):
    """The reference client's __send_data (api.py:160-199): one JSON dict
    per connection; get-data reads until EOF."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.connect((srv.host, srv.port))
    sock.sendall(json.dumps(payload).encode("utf-8"))
    if second_message is not None:
        time.sleep(0.3)
        sock.sendall(second_message)
        sock.close()
        return None
    if not response:
        sock.close()
        return None
    chunks = []
    sock.settimeout(10)
    while True:
        b = sock.recv(1024 * 100)
        if not b:
            break
        chunks.append(b)
    sock.close()
    return json.loads(b"".join(chunks).decode("utf-8"))


def test_get_data_split_payload(server):
    got = _request(server, {
        "METHOD": "get-data",
        "job_name": "job_batch_wiredemo",
        "from_timestamp": "2000-01-01T00:00:00",
        "to_timestamp": None,
    })
    # envelope: {"data": <orient='split' JSON string>} (engine.py:301-303)
    inner = got["data"]
    assert isinstance(inner, str)
    pdf = pd.read_json(io.StringIO(inner), orient="split")
    assert len(pdf) == 50
    assert "timestamp" in pdf.columns and "v1" in pdf.columns
    # epoch-float timestamps (engine.py:296-298)
    raw = json.loads(inner)
    assert set(raw) == {"columns", "index", "data"}
    ts_i = raw["columns"].index("timestamp")
    assert isinstance(raw["data"][0][ts_i], float)
    assert raw["data"][0][ts_i] == 1700000000 + 60


def test_get_data_pagination_and_empty(server):
    page = _request(server, {
        "METHOD": "get-data",
        "job_name": "job_batch_wiredemo",
        "from_timestamp": "2000-01-01T00:00:00",
        "to_timestamp": None,
        "limit": 10, "offset": 20,
    })
    raw = json.loads(page["data"])
    id_i = raw["columns"].index("id")
    assert [r[id_i] for r in raw["data"]] == list(range(21, 31))
    assert raw["index"] == list(range(20, 30))
    # a window with no rows -> {"data": null} (engine.py:306-308)
    empty = _request(server, {
        "METHOD": "get-data",
        "job_name": "job_batch_wiredemo",
        "from_timestamp": "2090-01-01T00:00:00",
        "to_timestamp": None,
    })
    assert empty["data"] is None
    # invalid timestamp -> error envelope (engine.py:317-321)
    bad = _request(server, {
        "METHOD": "get-data",
        "job_name": "job_batch_wiredemo",
        "from_timestamp": "not-a-timestamp",
        "to_timestamp": None,
    })
    assert bad["data"] is None and "error" in bad


def test_listing_methods(server):
    assert _request(server, {"METHOD": "get-models"})["models"] == list(
        server.api.get_models()
    )
    from exact_spark.ml.explain import METHODS

    assert _request(server, {"METHOD": "get-xai-methods"})["methods"] == list(METHODS)
    assert "spike" in _request(server, {"METHOD": "get-injection-methods"})[
        "injection_methods"
    ]
    jobs = _request(server, {"METHOD": "get-all-jobs"})["jobs"]
    assert jobs == ["job_batch_wiredemo"]
    cols = _request(server, {"METHOD": "get-columns", "name": "wiredemo"})["columns"]
    assert "v1" in cols and "is_anomaly" not in cols
    unknown = _request(server, {"METHOD": "no-such-method"})
    assert unknown == {"error": "method-error-response"}


def test_import_dataset_two_message(server, tmp_path):
    csv = "t,val\n2024-01-01T00:00:00,1.5\n2024-01-01T00:01:00,2.5\n"
    _request(server, {
        "METHOD": "import-dataset", "name": "up.csv", "timestamp_column": "t",
    }, second_message=csv.encode("utf-8"))
    dest = tmp_path / "datasets" / "up.csv"
    deadline = time.time() + 30
    while not dest.exists() and time.time() < deadline:
        time.sleep(0.2)
    assert dest.exists()
    out = pd.read_csv(dest)
    # time column renamed 'timestamp' and moved first
    # (execute_calls.py:1029-1044)
    assert list(out.columns)[0] == "timestamp"
    assert len(out) == 2
    # existing file: buffer drained, contents untouched (engine.py:366-371)
    before = dest.read_bytes()
    _request(server, {
        "METHOD": "import-dataset", "name": "up.csv", "timestamp_column": "t",
    }, second_message=b"t,val\nGARBAGE,9\n")
    time.sleep(1.0)
    assert dest.read_bytes() == before


def test_run_batch_over_the_wire(server, tmp_path):
    """Fire-and-forget run-batch (engine.py:161-205): the job runs on a
    daemon thread, appears in get-all-jobs when its table lands, and its
    run summary reaches the logfile sink."""
    # stage a dataset the job can ingest
    csv = "ts,v\n" + "\n".join(
        f"{1700000000 + i * 60},{10.0 + (i % 9) * 0.5}" for i in range(200)
    )
    (tmp_path / "datasets" / "wirejob.csv").write_text(csv)

    _request(server, {
        "METHOD": "run-batch",
        "model": "threshold",
        "dataset": "wirejob.csv",
        "name": "job_batch_wirejob",   # client pre-prefixes (api.py:28)
        "debug": False,
        "time_column": "ts",
        "label_column": None,
    }, response=False)

    logfile = tmp_path / "out" / "wirejob" / "logfile"
    deadline = time.time() + 90
    while not logfile.exists() and time.time() < deadline:
        time.sleep(0.5)
    assert logfile.exists(), "run summary never written"
    summary = json.loads(logfile.read_text())
    assert summary["rows"] == 200
    assert summary["model"] == "threshold"
    assert "job_batch_wirejob" in _request(server, {"METHOD": "get-all-jobs"})["jobs"]
    # cancel-job drops the table + output dir (engine.py:408-450)
    _request(server, {"METHOD": "cancel-job", "job_name": "job_batch_wirejob"},
             response=False)
    deadline = time.time() + 30
    while time.time() < deadline:
        if "job_batch_wirejob" not in _request(server, {"METHOD": "get-all-jobs"})["jobs"]:
            break
        time.sleep(0.5)
    assert "job_batch_wirejob" not in _request(server, {"METHOD": "get-all-jobs"})["jobs"]


def test_run_stream_over_the_wire(server, tmp_path):
    """run-stream dispatch (engine.py:207-255): fire-and-forget, the
    job_stream_ table lands with scored+flagged rows."""
    csv = "ts,v\n" + "\n".join(
        f"{1700000000 + i * 60},{10.0 + (i % 9) * 0.5}" for i in range(150)
    )
    (tmp_path / "datasets" / "wirestream.csv").write_text(csv)

    _request(server, {
        "METHOD": "run-stream",
        "model": "threshold",
        "dataset": "wirestream.csv",
        "name": "job_stream_wirestream",
        "speedup": 1000,
        "chunks": 2,
        "debug": False,
        "time_column": "ts",
        "label_column": None,
    }, response=False)

    deadline = time.time() + 120
    table = None
    while time.time() < deadline:
        jobs = _request(server, {"METHOD": "get-all-jobs"})["jobs"]
        if "job_stream_wirestream" in jobs:
            table = "job_stream_wirestream"
            break
        time.sleep(0.5)
    assert table, "stream table never appeared"
    # wait until the replay finished appending all rows; the end-of-replay
    # compaction swaps partition directories, so a poll that listed files
    # pre-swap can hit FILE_NOT_EXIST — plain parquet has no snapshot
    # isolation (documented on compact_table); a client retries
    def count_with_retry():
        try:
            return server.api.catalog.read_data(table).count()
        except Exception:
            return -1

    while time.time() < deadline:
        if count_with_retry() == 150:
            break
        time.sleep(0.5)
    # join the worker BEFORE the final read: the job is only done once the
    # end-of-replay compaction committed (the row count hits 150 earlier),
    # and a worker still writing when the session fixture stops Spark dies
    # with TASK_WRITE_FAILED — the suite's one historical flake
    worker = server.job_threads["wirestream"]
    worker.join(timeout=max(0.0, deadline - time.time()))
    assert not worker.is_alive(), "stream job did not finish in time"
    assert "wirestream" not in server.job_errors, server.job_errors["wirestream"]
    stored = server.api.catalog.read_data(table)
    assert stored.count() == 150
    assert "is_anomaly" in stored.columns


def test_get_queries_and_run_query(server):
    """Extension surface: the whole registered-analytics registry is
    servable over the wire — list it, then run one oracle-backed query
    against the testdata tables and get a bounded split payload back."""
    qs = _request(server, {"METHOD": "get-queries"})["queries"]
    names = {q["name"] for q in qs}
    assert len(names) > 100 and "g1_confusion_metrics" in names
    assert any(q["oracle"] for q in qs) and any(not q["oracle"] for q in qs)

    out = _request(
        server,
        {"METHOD": "run-query", "name": "rel_region_revenue",
         "sf_dir": "/root/testdata/sf0.001", "limit": 10},
    )
    assert out["columns"] == ["region", "revenue", "n_lineitems"]
    assert 0 < len(out["data"]) <= 10

    bad = _request(server, {"METHOD": "run-query", "name": "nope"})
    assert "error" in bad


def test_explain_query_over_wire(server):
    """The live EXPLAIN surface: a client can inspect the physical plan
    (broadcasts, PushedFilters) of any registered analytic before running
    it."""
    out = _request(
        server,
        {"METHOD": "explain-query", "name": "rel_region_revenue",
         "sf_dir": "/root/testdata/sf0.001"},
    )
    assert out["name"] == "rel_region_revenue"
    assert "BroadcastHashJoin" in out["plan"] or "Physical Plan" in out["plan"]
    bad = _request(server, {"METHOD": "explain-query", "name": "nope"})
    assert "error" in bad


def test_run_sql_over_the_wire(server):
    """Ad-hoc read-only SQL surface: a join aggregate runs through
    spark.sql over the registered views; DDL/DML and statement splitting
    are rejected; bad SQL returns a JSON error, not a dropped connection."""
    out = _request(server, {
        "METHOD": "run-sql",
        "sql": "SELECT r_name, count(*) AS n FROM region GROUP BY r_name",
        "sf_dir": "/root/testdata/sf0.001",
    })
    assert out["columns"] == ["r_name", "n"]
    assert len(out["data"]) == 5

    joined = _request(server, {
        "METHOD": "run-sql",
        "sql": "SELECT n.n_name, count(*) AS cnt FROM customer c "
               "JOIN nation n ON n.n_nationkey = c.c_nationkey "
               "GROUP BY n.n_name",
        "sf_dir": "/root/testdata/sf0.001",
        "limit": 3,
    })
    assert joined["columns"] == ["n_name", "cnt"] and len(joined["data"]) <= 3

    for bad_sql in (
        "DROP TABLE region",
        "SELECT 1; SELECT 2",
        "INSERT INTO region VALUES (9, 'X')",
    ):
        bad = _request(server, {
            "METHOD": "run-sql", "sql": bad_sql,
            "sf_dir": "/root/testdata/sf0.001",
        })
        assert "error" in bad

    broken = _request(server, {
        "METHOD": "run-sql", "sql": "SELECT nope FROM region",
        "sf_dir": "/root/testdata/sf0.001",
    })
    assert "error" in broken
