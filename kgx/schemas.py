"""Single source of truth for every StructType in the pipeline (SURVEY §1.2).

Schemas are explicit and versioned — determinism and checkpoint resume depend
on them being stable. Never infer a schema for a pipeline table.

Reference parity: the reference's per-tool row schemas (ChemSpot entity rows,
OPSIN structure rows, merged Extractor rows — SURVEY §1.1 [PK]) map onto
``MENTIONS`` / ``LINKS`` / ``TRIPLES`` below; shapes restated authoritatively
by BASELINE.json:L6 (stages, predicates) and L15 (source_files columns).
"""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMA_VERSION = 1

# ChemSpot's entity-type vocabulary (SURVEY §1.1; BASELINE.json:L6
# "ChemSpot-style chemical NER ... candidate chemical-entity spans").
MENTION_TYPES = (
    "SYSTEMATIC",
    "IDENTIFIER",
    "FORMULA",
    "TRIVIAL",
    "ABBREVIATION",
    "FAMILY",
    "MULTIPLE",
)

# Link methods (SURVEY §1.2 links table).
LINK_METHODS = ("exact", "systematic", "synonym", "abbrev", "fuzzy")

# Triple predicates (BASELINE.json:L6).
PREDICATES = ("mentions", "hasSMILES", "hasInChI", "synonymOf", "foundInRepo")

SOURCE_FILES = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# source_files + derived identity columns (attached by kgx.io.source).
SOURCE_FILES_KEYED = T.StructType(
    list(SOURCE_FILES.fields)
    + [
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("file_key", T.StringType(), False),
    ]
)

COMPOUND_DICT = T.StructType(
    [
        T.StructField("compound_id", T.LongType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("name_type", T.StringType(), False),
        T.StructField("synonyms", T.ArrayType(T.StringType()), True),
        T.StructField("formula", T.StringType(), True),
        T.StructField("cas", T.StringType(), True),  # CAS registry number
        T.StructField("smiles", T.StringType(), True),
        T.StructField("inchi", T.StringType(), True),
        T.StructField("inchikey", T.StringType(), True),
        # optional doc-local abbreviation (uppercase); used by the fixture
        # generator to plant "long form (ABBR)" definitions
        T.StructField("abbrev", T.StringType(), True),
        # priority for canonical-representative election (lower wins):
        # 0 = SYSTEMATIC, 1 = TRIVIAL, 2 = other
        T.StructField("priority", T.IntegerType(), False),
    ]
)

MENTION_STRUCT = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("norm_text", T.StringType(), False),
        T.StructField("mtype", T.StringType(), False),
        # for an ABBREVIATION mention seen in a definition context
        # "long form (ABBR)": the normalized long form; else null.
        T.StructField("defined_as", T.StringType(), True),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("file_key", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("mention_id", T.LongType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("norm_text", T.StringType(), False),
        T.StructField("mtype", T.StringType(), False),
        T.StructField("defined_as", T.StringType(), True),
    ]
)

LINKS = T.StructType(
    [
        T.StructField("mention_id", T.LongType(), False),
        T.StructField("file_key", T.StringType(), False),
        T.StructField("compound_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("method", T.StringType(), False),
    ]
)

COMPONENTS = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("component_id", T.LongType(), False),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("output_rows", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

GOLDEN_MENTIONS = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("mtype", T.StringType(), False),
        T.StructField("compound_id", T.LongType(), True),  # null = hard negative
    ]
)

# NOTE on CC node identity (SURVEY §2 D9): the canonicalization graph
# contains ONLY dictionary compound_ids (exact small longs) — mentions are
# degree-1 leaves that cannot merge components and are excluded from the
# graph (kgx.pipeline.build_edges).  There are therefore no hashed node ids
# in pipeline CC and no birthday-collision risk at any corpus scale.
