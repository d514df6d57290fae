"""JSONL edge / doc readers (sources/edge_json)."""

import gzip
import os

from plato_spark.sources.edge_json import read_doc_jsonl, read_edge_jsonl


def test_edge_jsonl_reads_and_drops_malformed(spark, tmp_path):
    p = str(tmp_path / "edges.jsonl")
    with open(p, "w") as fh:
        fh.write('{"src": 1, "dst": 2}\n')
        fh.write('{"src": 3, "dst": 4, "weight": 0.5}\n')
        fh.write("this is not json\n")
        fh.write('{"src": 5}\n')                     # missing dst -> dropped
        fh.write('{"dst": 9, "src": 7}\n')           # key order irrelevant
    got = sorted((r.src, r.dst) for r in read_edge_jsonl(spark, p).collect())
    assert got == [(1, 2), (3, 4), (7, 9)]


def test_edge_jsonl_weighted_and_gzip(spark, tmp_path):
    p = str(tmp_path / "edges.jsonl.gz")
    with gzip.open(p, "wt") as fh:
        fh.write('{"src": 1, "dst": 2, "weight": 2.5}\n')
        fh.write('{"src": 3, "dst": 4}\n')           # weight null
    rows = {(r.src, r.dst): r.weight
            for r in read_edge_jsonl(spark, p, weighted=True).collect()}
    assert rows == {(1, 2): 2.5, (3, 4): None}


def test_doc_jsonl_with_extras(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as fh:
        fh.write('{"doc_id": 1, "text": "hello", "lang": "en"}\n')
        fh.write('{"doc_id": 2, "lang": "de"}\n')    # no text -> dropped
        fh.write('{"doc_id": 3, "text": "welt"}\n')  # lang null, kept
    got = {r.doc_id: (r.text, r.lang) for r in read_doc_jsonl(
        spark, p, extra_fields={"lang": "string"}).collect()}
    assert got == {1: ("hello", "en"), 3: ("welt", None)}


def test_edge_jsonl_custom_field_names(spark, tmp_path):
    p = str(tmp_path / "links.jsonl")
    with open(p, "w") as fh:
        fh.write('{"from_id": 10, "to_id": 20}\n')
    got = read_edge_jsonl(spark, p, src_field="from_id",
                          dst_field="to_id").collect()
    assert (got[0].src, got[0].dst) == (10, 20)
