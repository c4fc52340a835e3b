"""Golden-fixture regression tests (FIXTURES.md §3): the shared core frozen
at a known-good state. Any semantic drift in normalization, chunking, or
extraction fails here BEFORE it can silently shift the Spark/oracle pair
(they share core.py, so only goldens catch a both-sides drift)."""

import json
from pathlib import Path

import pytest

from master_project_spark.datagen import gen_transcripts
from master_project_spark.oracle import (oracle_chunks, oracle_mentions,
                                         oracle_triples)

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def rows():
    return gen_transcripts(n_convs=40, max_turns=20, seed=42)


def _load(name):
    with open(GOLDEN / name) as f:
        return [json.loads(line) for line in f]


def test_triples_match_golden(rows):
    got = [json.loads(json.dumps(t, sort_keys=True))
           for t in oracle_triples(rows)]
    assert got == _load("triples.jsonl")


def test_chunks_match_golden(rows):
    got = [json.loads(json.dumps(c, sort_keys=True))
           for c in oracle_chunks(rows)]
    assert got == _load("chunks.jsonl")


def test_mentions_match_golden(rows):
    got = [json.loads(json.dumps(m, sort_keys=True))
           for m in oracle_mentions(rows)]
    assert got == _load("mentions.jsonl")
