"""The end-to-end training-data pipeline example stays runnable
(subprocess — the script owns its Ray session)."""

import json
import os
import subprocess
import sys


def test_training_data_pipeline_example(tmp_path):
    env = dict(os.environ)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "examples",
                         "training_data_pipeline.py"),
            "/root/testdata/sf0.001",
            str(tmp_path / "tdp"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["input"] == 500
    assert 0 < res["after_scrub_dedup_gate"] <= res["input"]
    # mixture keeps all English and ~half of everything else
    assert 0 < res["after_mixture"] <= res["after_scrub_dedup_gate"]
    assert res["train_chunks_64tok"] >= res["after_mixture"]
    # packing: sequence count consistent with the token stream length
    assert res["packed_sequences_512"] >= res["packed_tokens"] // 512
    assert res["packed_tokens"] > 0
    assert res["sample_query_total"] > 0 and len(res["sample_top"]) == 3
