"""RDF source loaders + the combined format dispatcher.

``load_rdf`` is the analog of the reference's RDFParserCombined
(RDF/RDFParserCombined.swift:16-171 and RDF/RDF.swift:58-159): pick the
parser from the file extension, falling back to content sniffing for
unknown extensions. N-Triples/N-Quads load line-parallel; Turtle uses
the statement-parallel subset loader (driver fallback for the full
grammar); RDF/XML parses on the driver (SAX-equivalent, like the
reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kineo_spark.sources import ntriples  # noqa: F401

_NT_EXTS = (".nt", ".nq", ".ntriples", ".nquads")
_TTL_EXTS = (".ttl", ".trig", ".turtle")
_XML_EXTS = (".rdf", ".xml", ".owl")


def _sniff(path: str) -> str:
    """Peek at the head of the file to guess the syntax."""
    with open(path, "rb") as fh:
        head = fh.read(4096).decode("utf-8", errors="replace").lstrip("﻿ \t\r\n")
    if head.startswith("<?xml") or "<rdf:RDF" in head[:1024]:
        return "rdfxml"
    low = head[:2048].lower()
    if "@prefix" in low or low.startswith("prefix") or low.startswith("@base"):
        return "turtle"
    return "ntriples"


def load_rdf(
    spark: SparkSession, path: str, default_graph: str = "urn:g:default",
    base: str = "",
) -> DataFrame:
    """Load any supported RDF file into the flat quads schema,
    dispatching on extension (content-sniffed when unknown)."""
    lower = path.lower()
    if lower.endswith(_NT_EXTS):
        kind = "ntriples"
    elif lower.endswith(_TTL_EXTS):
        kind = "turtle"
    elif lower.endswith(_XML_EXTS):
        kind = "rdfxml"
    else:
        kind = _sniff(path)

    if kind == "ntriples":
        from kineo_spark.sources.ntriples import load_ntriples

        return load_ntriples(spark, path, default_graph)
    if kind == "turtle":
        from kineo_spark.sources.turtle import load_turtle_distributed

        return load_turtle_distributed(spark, path, default_graph, base=base)
    from kineo_spark.sources.rdfxml import load_rdfxml

    return load_rdfxml(spark, path, default_graph, base=base)
