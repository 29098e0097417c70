"""File-path ingestion source: decompression + syntax dispatch
(Compression.java:28-134 parity for file-based deployments)."""

import bz2
import gzip
import lzma
import os

from r2s2_spark.naming import EX, RDF
from r2s2_spark.operators.extract import extract
from r2s2_spark.sources.files import read_rdf_files, split_extensions


def test_split_extensions():
    assert split_extensions("x/a.nt") == (None, "ntriples")
    assert split_extensions("a.NT.GZ") == (".gz", "ntriples")
    assert split_extensions("a.ttl.bz2") == (".bz2", "turtle")
    assert split_extensions("a.rdf") == (None, "rdfxml")
    assert split_extensions("a.owl.xz") == (".xz", "rdfxml")
    assert split_extensions("a.nq.zst") == (".zst", "nquads")
    assert split_extensions("readme.md") == (None, None)


def test_read_rdf_files_mixed_codecs(spark, tmp_path):
    """One directory of plain/gz/bz2/xz files in three syntaxes loads into
    a single statement set; an undecodable file becomes a decode_error row,
    never a crash."""
    d = str(tmp_path)
    with open(os.path.join(d, "a.nt"), "w") as f:
        f.write(f'<{EX}s1> <{EX}p> "plain" .\n')
    with gzip.open(os.path.join(d, "b.nt.gz"), "wb") as f:
        f.write(f'<{EX}s2> <{EX}p> "gz" .\n'.encode())
    with bz2.open(os.path.join(d, "c.ttl.bz2"), "wb") as f:
        f.write(f'@prefix ex: <{EX}> .\nex:s3 ex:p "bz2" .\n'.encode())
    with lzma.open(os.path.join(d, "e.nt.xz"), "wb") as f:
        f.write(f'<{EX}s5> <{EX}p> "xz" .\n'.encode())
    with open(os.path.join(d, "d.rdf"), "w") as f:
        f.write(
            f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
            f'<rdf:Description rdf:about="{EX}s4"><ex:p>rdfxml</ex:p>'
            f"</rdf:Description></rdf:RDF>"
        )
    with open(os.path.join(d, "bad.nt.zst"), "wb") as f:
        f.write(b"\x28\xb5\x2f\xfdnope")  # zstd codec absent in the sandbox

    src = read_rdf_files(spark, d)
    rows = src.collect()
    assert len(rows) == 6
    errs = [r for r in rows if r.decode_error]
    assert len(errs) == 1 and errs[0].path.endswith("bad.nt.zst")

    good = src.where("decode_error is null").drop("decode_error")
    trips = extract(good).collect()
    got = {(r.s_path, r.o_lex) for r in trips if r.o_kind == "literal"}
    assert got == {
        ("/s1", "plain"),
        ("/s2", "gz"),
        ("/s3", "bz2"),
        ("/s4", "rdfxml"),
        ("/s5", "xz"),
    }
