"""kineo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the kasei/kineo SPARQL quadstore.

This is NOT a port: the reference (Swift, pull-iterator, single-process;
see /root/reference and SURVEY.md) defines WHAT to compute — SPARQL 1.1
algebra over RDF quads plus its expression/aggregate/window/path surface.
We re-express all of it as Spark DataFrame plans so Catalyst/Tungsten do
the physical work (join ordering, pushdown, codegen, spill, AQE), and we
extend the surface with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  model.py        Term/quad schemas and constructors (struct columns)
  algebra.py      SPARQL algebra dataclasses (SURVEY.md §2 inventory)
  expr.py         Expression AST → Column compiler (SPARQL value semantics)
  store.py        QuadStore implementations (generic quads DF + vertical-
                  partitioned relational mapping of the driver tables)
  compiler.py     algebra → DataFrame compiler
  forms.py        SELECT / ASK / CONSTRUCT / DESCRIBE query forms
  paths.py        property paths incl. distributed transitive closure
  rewrite.py      algebra rewrite passes kept from the reference
  sources/        N-Triples/N-Quads distributed parser + serializers
  pipeline/       dedup / similarity / text-analysis / multimodal ops
  streaming/      Structured Streaming surface over the events table
"""

__version__ = "0.1.0"

from kineo_spark.session import get_spark  # noqa: F401
