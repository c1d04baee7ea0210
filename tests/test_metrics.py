"""observe() counters + streaming progress ring."""

import json
import time


def test_observe_and_progress_ring(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.metrics import ProgressRing, observe_events

    ring = ProgressRing()
    spark.streams.addListener(ring)
    try:
        indir = tmp_path / "in"
        indir.mkdir()
        with open(indir / "a.jsonl", "w") as fh:
            for i in range(25):
                fh.write(json.dumps({"k": "x", "n": i}) + "\n")

        p = Pipeline.from_dict(
            {
                "settings": {"decoder": "json", "decoder_params": {"schema": "k string, n long"}},
                "input": {"type": "file", "path": str(indir), "filename_pattern": "*.jsonl"},
                "actions": [
                    {"type": "discard", "do_if": {"op": "int_val_cmp", "field": "n", "cmp_op": "ge", "value": 20}}
                ],
            }
        )
        df = observe_events(p.apply(p.read_stream(spark)), "fd_out")
        q = (
            df.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async
        deadline = time.time() + 20
        totals = ring.totals(q.id)
        while time.time() < deadline and totals["numInputRows"] < 25:
            time.sleep(0.5)
            totals = ring.totals(q.id)
        assert totals["numInputRows"] == 25
        assert totals["observedMetrics"]["fd_out"]["events"] == 20  # post-discard
    finally:
        spark.streams.removeListener(ring)
