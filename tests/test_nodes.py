"""Node-registry source tests (sources/nodes.py): XML parse into the
nodes dim, MN filter, broadcast enrichment join."""

from __future__ import annotations

import pytest

NODE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<ns2:nodeList xmlns:ns2="http://ns.dataone.org/service/types/v2.0">
  <node type="mn" state="up">
    <identifier>urn:node:KNB</identifier>
    <name>Knowledge Network for Biocomplexity</name>
    <description>KNB repo</description>
    <baseURL>https://knb.example.org/mn</baseURL>
  </node>
  <node type="cn" state="up">
    <identifier>urn:node:CN</identifier>
    <name>Coordinating Node</name>
    <description>cn</description>
    <baseURL>https://cn.example.org/cn</baseURL>
  </node>
  <node type="mn" state="down">
    <identifier>urn:node:ARCTIC</identifier>
    <name>Arctic Data Center</name>
    <description>ADC</description>
    <baseURL>https://arctic.example.org/mn</baseURL>
  </node>
</ns2:nodeList>
"""


def test_nodes_from_xml_mn_only(spark):
    from metrics_service_spark.sources.nodes import nodes_from_xml

    got = {
        r.node_id: r.node_name for r in nodes_from_xml(spark, NODE_XML).collect()
    }
    assert got == {
        "urn:node:KNB": "Knowledge Network for Biocomplexity",
        "urn:node:ARCTIC": "Arctic Data Center",
    }


def test_nodes_from_xml_all(spark):
    from metrics_service_spark.sources.nodes import nodes_from_xml

    got = nodes_from_xml(spark, NODE_XML, mn_only=False)
    assert got.count() == 3
    assert {r.node_type for r in got.collect()} == {"mn", "cn"}


def test_enrich_node_names(spark):
    from metrics_service_spark.sources.nodes import (
        enrich_node_names,
        nodes_from_xml,
    )

    nodes = nodes_from_xml(spark, NODE_XML)
    events = spark.createDataFrame(
        [("e1", "urn:node:KNB"), ("e2", "urn:node:UNKNOWN")],
        "eventId string, nodeId string",
    )
    got = {r.eventId: r.node_name for r in enrich_node_names(events, nodes).collect()}
    assert got == {"e1": "Knowledge Network for Biocomplexity", "e2": None}
