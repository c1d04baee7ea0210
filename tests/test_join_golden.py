"""Golden pairs for the join (multiline collapse) action, using the
reference's own postgres corpus
(/root/reference/plugin/action/join/join_test.go contentPostgres,
TestSimpleJoin): 17 input lines collapse to 7 events, in both plain
and negate modes."""

from tests.test_actions import run_actions

START_PAT = r"^\d\d\d\d-\d\d-\d\d \d\d:\d\d:\d\d.*?\[\d+\] => .+?client=.+?,db=.+?,user=.+:.*"

HEAD = "2021-10-12 08:25:44 GMT [23379] => [%d-1] client=[local],db=exampledb,user=none "

POSTGRES_LINES = [
    HEAD % 520 + "LOG:  duration: 0.287 ms  bind <unnamed>: select distinct connamespace as schema_id\n",
    "\tfrom pg_catalog.pg_constraint F,\n",
    "\t    pg_catalog.pg_class O\n",
    "\twhere F.contype = 'f'\n",
    "\t and F.confrelid = O.oid\n",
    "\t and O.relnamespace in ($1)\n",
    HEAD % 521 + "DETAIL:  parameters: $1 = '2200'\n",
    HEAD % 522 + "LOG:  duration: 0.043 ms  execute <unnamed>: select distinct connamespace as schema_id\n",
    "\tfrom pg_catalog.pg_constraint F,\n",
    "\t    pg_catalog.pg_class O\n",
    "\twhere F.contype = 'f'\n",
    "\t and F.confrelid = O.oid\n",
    "\t and O.relnamespace in ($1)\n",
    HEAD % 523 + "DETAIL:  parameters: $1 = '2200'\n",
    HEAD % 524 + "LOG:  duration: 0.056 ms  parse <unnamed>: SHOW TRANSACTION ISOLATION LEVEL\n",
    HEAD % 525 + "LOG:  duration: 0.009 ms  bind <unnamed>: SHOW TRANSACTION ISOLATION LEVEL\n",
    HEAD % 526 + "LOG:  duration: 0.018 ms  execute <unnamed>: SHOW TRANSACTION ISOLATION LEVEL\n",
]


def run_join(spark, lines, **cfg):
    rows = [(i, line) for i, line in enumerate(lines)]
    out = run_actions(
        spark,
        rows,
        "seq long, log string",
        [{"type": "join", "field": "log", "seq_field": "seq", **cfg}],
    )
    return sorted((r.seq, r.log) for r in out.collect())


def test_join_postgres_logs(spark):
    got = run_join(
        spark, POSTGRES_LINES, start=f"/{START_PAT}/", **{"continue": "/.+/"}
    )
    assert len(got) == 7
    # first event holds the 6-line bind statement, in order
    assert got[0][1] == "".join(POSTGRES_LINES[0:6])
    assert got[1][1] == POSTGRES_LINES[6]
    assert got[2][1] == "".join(POSTGRES_LINES[7:13])
    assert [g[1] for g in got[3:]] == POSTGRES_LINES[13:]


def test_join_postgres_logs_negate(spark):
    """negate mode: continue = NOT start pattern."""
    got = run_join(
        spark,
        POSTGRES_LINES,
        start=f"/{START_PAT}/",
        negate=True,
        **{"continue": f"/{START_PAT}/"},
    )
    assert len(got) == 7
    assert got[0][1] == "".join(POSTGRES_LINES[0:6])
    assert got[2][1] == "".join(POSTGRES_LINES[7:13])


def test_join_leading_continuation_passes_through(spark):
    """lines before any start are standalone events (no open block)."""
    lines = ["\tleading continuation\n"] + POSTGRES_LINES[:7]
    got = run_join(spark, lines, start=f"/{START_PAT}/", **{"continue": "/.+/"})
    assert len(got) == 3
    assert got[0][1] == lines[0]
    assert got[1][1] == "".join(lines[1:7])


# reference sample corpus: plugin/action/join_template/sample/
# go_data_race.txt (3 race reports; TestSimpleJoin expects 3 events per
# report: opening fence, joined WARNING block, closing fence = 9 total)
_GO_DATA_RACE_SAMPLE = """\
==================
WARNING: DATA RACE
Read at 0x00c000118008 by goroutine 5:
  main.main.func1()
      /Users/qwe/base/awesomeProject/main.go:10 +0x38

Previous write at 0x00c000118008 by main goroutine:
  main.main()
      /Users/qwe/base/awesomeProject/main.go:15 +0xc0

Goroutine 5 (running) created at:
  main.main()
      /Users/qwe/base/awesomeProject/main.go:8 +0x9c
==================
==================
WARNING: DATA RACE
Write at 0x00c000118008 by goroutine 5:
  main.main.func1()
      /Users/qwe/base/awesomeProject/main.go:10 +0x48

Previous write at 0x00c000118008 by main goroutine:
  main.main()
      /Users/qwe/base/awesomeProject/main.go:15 +0xc0

Goroutine 5 (running) created at:
  main.main()
      /Users/qwe/base/awesomeProject/main.go:8 +0x9c
==================
==================
WARNING: DATA RACE
Read at 0x00c000118008 by main goroutine:
  main.main()
      /Users/qwe/base/awesomeProject/main.go:15 +0xb0

Previous write at 0x00c000118008 by goroutine 5:
  main.main.func1()
      /Users/qwe/base/awesomeProject/main.go:10 +0x48

Goroutine 5 (running) created at:
  main.main()
      /Users/qwe/base/awesomeProject/main.go:8 +0x9c
==================
"""


def test_join_template_go_data_race_golden(spark):
    """go_data_race template over the reference's sample corpus
    (join_template_test.go should_ok_for_go_data_race: 3 events per
    report — opening fence, joined WARNING block, closing fence)."""
    from file_d_spark import Pipeline

    lines = _GO_DATA_RACE_SAMPLE.split("\n")[:-1]  # keep interior empties
    rows = [(1, i, l) for i, l in enumerate(lines)]
    df = spark.createDataFrame(rows, "src int, seq int, log string")
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "join_template",
                    "template": "go_data_race",
                    "field": "log",
                    "source_field": "src",
                    "seq_field": "seq",
                }
            ]
        }
    )
    out = sorted(p.apply(df).collect(), key=lambda r: r.seq)
    assert len(out) == 9, [r.log[:30] for r in out]
    blocks = [r for r in out if r.log.startswith("WARNING: DATA RACE")]
    fences = [r for r in out if r.log.strip("=") == ""]
    assert len(blocks) == 3 and len(fences) == 6
    for b in blocks:
        assert "Goroutine 5 (running) created at:" in b.log
        assert "==========" not in b.log  # fences never join the block
