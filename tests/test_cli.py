"""CLI subcommand tests (driven through main(), reusing the session)."""

from __future__ import annotations

import json

from aircraftutilization_etl_spark.__main__ import main

T0 = 1712338215


def _vector(icao, t, vel, vr):
    return [icao, "CS", "US", t, t, 1.0, 2.0, 100.0, False,
            vel, 10.0, vr, None, 120.0, None, False, 0]


def test_cli_full_lifecycle(spark, tmp_path, capsys):
    # `spark` fixture keeps the session alive; build_session inside main()
    # returns the same active session via getOrCreate.
    csv = tmp_path / "aircraft.csv"
    csv.write_text(
        "icao24,manufacturericao,model,operator,owner,registration,"
        "serialnumber,built\n"
        "abc123,AIRBUS,A320,OpCo,OwnCo,N123,SN1,2015-06-01\n"
    )
    root = str(tmp_path / "data")
    payloads = [
        (T0, [_vector("abc123", T0, 120.0, 8.0)]),
        (T0 + 600, [_vector("abc123", T0 + 600, 150.0, -5.0)]),
        (T0 + 1200, [_vector("abc123", T0 + 1200, 5.0, 0.0)]),
    ]
    assert main(["metadata", "--csv", str(csv), "--root", root]) == 0
    for i, (now, states) in enumerate(payloads):
        p = tmp_path / f"p{i}.json"
        p.write_text(json.dumps({"time": now, "states": states}))
        assert main(
            ["active", "--payload", str(p), "--root", root,
             "--now-epoch", str(now)]
        ) == 0
        assert main(["complete", "--root", root]) == 0

    facts = spark.read.parquet(f"{root}/facts")
    rows = facts.collect()
    assert len(rows) == 1
    assert rows[0]["flight_duration_minutes"] == 20
    assert rows[0]["model"] == "A320"


def test_cli_list_queries(capsys):
    from aircraftutilization_etl_spark.__main__ import main

    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out
    assert "q_emb_kmeans" in out
    assert len(out.strip().splitlines()) >= 100


def test_cli_query_unknown_name(spark):
    from aircraftutilization_etl_spark.__main__ import main

    assert (
        main(["query", "q_does_not_exist", "--data", "/root/testdata/sf0.001"])
        == 2
    )
