"""4-layer config coalesce parity (reference DGAConfiguration.java /
DGAXMLConfigurationParser.java / DGARunner.java wiring; see
DGAConfigurationTest.java + DGAXMLConfigurationParserTest.java for the
reference's own coverage of last-wins merging and malformed XML)."""

import pytest

from distributed_graph_analytics_spark import config as C
from distributed_graph_analytics_spark.cli import build_parser, resolve_config


XML = """<?xml version="1.0" encoding="UTF-8"?>
<configuration>
    <system>
        <property><name>spark.sql.shuffle.partitions</name><value>8</value></property>
    </system>
    <custom>
        <property><name>minimum.progress</name><value>500</value></property>
        <property><name>simple.edge.delimiter</name><value>\\x01</value></property>
    </custom>
    <giraph>
        <property><name>w</name><value>4</value></property>
    </giraph>
</configuration>
"""


def test_coalesce_last_wins():
    low = C.DGAConfig(custom={"a": "1", "b": "1"}, system={"s": "x"})
    high = C.DGAConfig(custom={"b": "2"})
    merged = C.coalesce(low, high)
    assert merged.custom == {"a": "1", "b": "2"}
    assert merged.system == {"s": "x"}


def test_engine_key_restriction():
    conf = C.DGAConfig()
    conf.set_engine_property("-w", "4")
    conf.set_engine_property("-q", "")
    with pytest.raises(ValueError, match="not allowed"):
        conf.set_engine_property("-eif", "SomeClass")


def test_parse_config_xml_sections():
    conf = C.parse_config_xml(XML)
    assert conf.system == {"spark.sql.shuffle.partitions": "8"}
    assert conf.custom["minimum.progress"] == "500"
    assert conf.engine == {"-w": "4"}


def test_parse_config_xml_malformed():
    bad = "<configuration><custom><property><name>x</name></property></custom></configuration>"
    with pytest.raises(ValueError, match="Malformed"):
        C.parse_config_xml(bad)


def test_parse_ca_args_namespaces():
    conf = C.parse_ca_args(
        ["minimum.progress=100", "S:fs.defaultFS=file:///", "spark.driver.memory=4g"]
    )
    assert conf.custom == {"minimum.progress": "100"}
    assert conf.system == {
        "fs.defaultFS": "file:///",
        "spark.driver.memory": "4g",
    }
    with pytest.raises(ValueError):
        C.parse_ca_args(["no-equals-sign"])


def test_minimal_defaults_hbse_matches_reference():
    # DGARunner.java:114-118
    conf = C.minimal_defaults("hbse", "/out")
    assert conf.custom[C.HBSE_SET_MAX_SIZE] == "10"
    assert conf.custom[C.HBSE_PIVOT_BATCH_SIZE] == "10"
    assert conf.custom[C.HBSE_PIVOT_BATCH_SIZE_INITIAL] == "10"
    assert conf.custom[C.HBSE_TOTAL_PIVOT_COUNT] == "5"
    assert conf.custom[C.HBSE_OUTPUT_DIR] == "/out"


def test_resolve_order_file_beats_defaults_ca_beats_file():
    file_conf = C.DGAConfig(custom={C.HBSE_SET_MAX_SIZE: "20", "x": "file"})
    cli_conf = C.DGAConfig(custom={"x": "cli"})
    conf = C.resolve("hbse", file_conf, cli_conf, "/out")
    assert conf.custom[C.HBSE_SET_MAX_SIZE] == "20"  # file > minimal default
    assert conf.custom["x"] == "cli"  # cli > file
    # required layer trumps everything (pr forces vertex-value write,
    # DGARunner.java:146)
    pr = C.resolve("pr", C.DGAConfig(custom={C.WRITE_VERTEX_VALUE: "false"}), None)
    assert pr.custom[C.WRITE_VERTEX_VALUE] == "true"


def test_cli_fold_explicit_flag_wins(tmp_path):
    xml = tmp_path / "dga-config.xml"
    xml.write_text(XML)
    # flag left at default -> config wins; -w giraph flag -> parallelism
    args = build_parser().parse_args(
        ["louvain", "--sf-dir", "/d", "-o", "/o", "--conf-file", str(xml)]
    )
    resolve_config(args)
    assert args.minprogress == 500
    assert args.parallelism == 4
    # explicitly typed flat flag beats the file layer
    args2 = build_parser().parse_args(
        ["louvain", "--sf-dir", "/d", "-o", "/o", "--conf-file", str(xml),
         "--minprogress", "7"]
    )
    resolve_config(args2)
    assert args2.minprogress == 7
    # --ca beats the file layer
    args3 = build_parser().parse_args(
        ["louvain", "--sf-dir", "/d", "-o", "/o", "--conf-file", str(xml),
         "--ca", "minimum.progress=9"]
    )
    resolve_config(args3)
    assert args3.minprogress == 9


def test_cli_hex_delimiter_from_config(tmp_path):
    from distributed_graph_analytics_spark.sources.edges import decode_delimiter

    xml = tmp_path / "dga-config.xml"
    xml.write_text(XML)
    args = build_parser().parse_args(
        ["wcc", "--sf-dir", "/d", "-o", "/o", "--conf-file", str(xml)]
    )
    resolve_config(args)
    # Hive ^A delimiter round-trips through config + hex decode
    # (DGAAbstractEdgeInputFormat.java:94-97)
    assert decode_delimiter(args.delimiter) == "\x01"
