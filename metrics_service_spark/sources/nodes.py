"""Member-node registry source (SURVEY.md S12, J8).

Reference: `get_MN_Dict` GETs the node-list XML and builds {identifier:
name} with ElementTree (metricsreporter.py:678-703); the dict enriches
report rows one lookup at a time (:331-371).

Spark-first: the XML lands as a file (the I/O hop stays external per
the engine boundary) and is parsed with the native `from_xml`
expression into a proper `nodes` dimension DataFrame — the broadcast
side of every node-name enrichment join.  No ElementTree, no driver
dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: One <node> element's fields we consume (d1 NodeList schema subset).
NODE_XML_SCHEMA = (
    "_type string, identifier string, name string, description string, baseURL string"
)


def nodes_from_xml(spark: SparkSession, xml: str, *, mn_only: bool = True) -> DataFrame:
    """Parse a d1 NodeList XML document into the nodes dimension:
    (node_id, node_name, node_type).  `mn_only` keeps member nodes, the
    reference's default (metricsreporter.py:693-697)."""
    # split the document into per-<node> fragments JVM-side, then parse
    # each fragment with from_xml (the XML analog of from_json)
    doc = spark.createDataFrame([(xml,)], "doc string")
    nodes = (
        doc.select(
            F.explode(
                # drop the prologue before the first <node ...>
                F.slice(
                    F.split(F.col("doc"), r"<node\s"),
                    2,
                    1_000_000,
                )
            ).alias("frag")
        )
        .select(F.concat(F.lit("<node "), F.col("frag")).alias("frag"))
        .select(
            F.from_xml(
                F.regexp_extract(F.col("frag"), r"(?s)(<node .*?</node>)", 1),
                NODE_XML_SCHEMA,
            ).alias("n")
        )
        .select(
            F.col("n.identifier").alias("node_id"),
            F.col("n.name").alias("node_name"),
            F.col("n._type").alias("node_type"),
        )
        .filter(F.col("node_id").isNotNull())
    )
    if mn_only:
        nodes = nodes.filter(F.col("node_type") == "mn")
    return nodes


def enrich_node_names(
    df: DataFrame, nodes: DataFrame, *, node_col: str = "nodeId"
) -> DataFrame:
    """J8: node-name enrichment as a broadcast join (the reference's
    mn_dict[node] lookups, metricsreporter.py:331-371)."""
    return df.join(
        F.broadcast(nodes.select("node_id", "node_name")),
        df[node_col] == F.col("node_id"),
        "left",
    ).drop("node_id")
