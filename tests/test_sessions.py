"""Gap-based sessionization semantics."""

from venice_spark.sessions import session_stats, sessionize


def test_sessionize_gap_semantics(spark):
    rows = [
        ("u1", 0), ("u1", 10), ("u1", 200), ("u1", 205),  # gap 100 -> 2 sessions
        ("u2", 50),
    ]
    df = spark.createDataFrame(rows, "user string, ts long")
    out = sessionize(df, "user", "ts", gap=100).collect()
    seqs = {(r["user"], r["ts"]): r["session_seq"] for r in out}
    assert seqs == {("u1", 0): 0, ("u1", 10): 0, ("u1", 200): 1, ("u1", 205): 1, ("u2", 50): 0}

    stats = {(r["user"], r["session_seq"]): (r["n_events"], r["duration"])
             for r in session_stats(df, "user", "ts", gap=100).collect()}
    assert stats[("u1", 0)] == (2, 10)
    assert stats[("u1", 1)] == (2, 5)
    assert stats[("u2", 0)] == (1, 0)
