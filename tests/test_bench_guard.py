"""bench.py stdout-contract guard: the consumer keeps only a ~2000-char
tail of stdout and parses the LAST line, so the headline JSON must stay
under the limit — and an overflow must degrade to a minimal parseable
line, never to silence."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import stdout_line  # noqa: E402


def test_short_line_passes_through():
    out = {"metric": "headline_query_wall_sec", "value": 1.0, "queries": {"q1": 0.5}}
    line = stdout_line(out)
    assert json.loads(line) == out


def test_overflow_drops_queries_but_stays_parseable(capsys):
    out = {
        "metric": "headline_query_wall_sec",
        "value": 1.0,
        "sf": 0.1,
        "queries": {f"q{i}": 0.123456 for i in range(400)},
    }
    assert len(json.dumps(out)) >= 1900  # the guard must actually fire
    line = stdout_line(out)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_wall_sec"
    assert parsed["value"] == 1.0
    assert "queries" not in parsed
    # the overflow is reported on stderr, not swallowed
    assert "too long" in capsys.readouterr().err
