"""S2 JSON-lines source: nested-tree round-trip + recursive lookup
(reference: OpenAddresses dir-walk importer, lib.rs:109-146)."""

import os

from addresses_importer_spark.sources.jsonl import (
    read_docs_jsonl, write_docs_jsonl_tree,
)


def test_jsonl_tree_roundtrip_recursive(spark, tmp_path):
    rows = [
        (1, "en", "hello world"),
        (2, "de", 'quotes " and \\ backslash ümläut'),
        (3, "en", ""),          # empty string must stay "" not NULL
        (4, "fr", None),        # NULL text must stay NULL
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    path = str(tmp_path / "tree")
    write_docs_jsonl_tree(docs, path)

    # the tree is genuinely nested (one dir per lang) — recursive
    # lookup is exercised, not a flat-glob accident
    subdirs = [d for d in os.listdir(path) if d.startswith("lang_dir=")]
    assert len(subdirs) == 3, subdirs

    back = read_docs_jsonl(spark, path)
    got = {(r["doc_id"], r["lang"], r["text"]) for r in back.collect()}
    assert got == set(rows)
