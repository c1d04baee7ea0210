"""Streaming dead queue: a sink that keeps failing routes the batch to
the dead-queue location; the stream survives."""

import glob
import json


def test_dead_queue_on_sink_failure(spark, tmp_path):
    from file_d_spark import Pipeline

    indir = tmp_path / "in"
    indir.mkdir()
    with open(indir / "x.jsonl", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"k": "v", "n": i}) + "\n")

    def exploding_transport(payload):
        raise RuntimeError("endpoint down")

    dq = str(tmp_path / "dead")
    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "json", "decoder_params": {"schema": "k string, n long"}},
            "input": {"type": "file", "path": str(indir), "filename_pattern": "*.jsonl"},
            "output": {
                "type": "http",
                "transport": exploding_transport,
                "retry": 2,
                "dead_queue": dq,
            },
        }
    )
    q = p.run_stream(spark, checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(120)

    rows = []
    for path in glob.glob(f"{dq}/epoch=*/part-*"):
        with open(path) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert len(rows) == 5
    assert {r["n"] for r in rows} == {0, 1, 2, 3, 4}
