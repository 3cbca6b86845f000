"""Four-layer configuration coalesce mirroring the reference's planner.

The reference's only "planner" is configuration layering (SURVEY §3.2):
hard-coded minimal defaults < ``dga-config.xml`` < command line <
analytic-required settings, merged last-wins per key by
``DGAConfiguration.coalesce`` (dga-giraph DGAConfiguration.java:187-196)
with three property namespaces — ``system`` (``-D`` Hadoop/Giraph
properties), ``custom`` (``-ca`` analytic arguments) and the restricted
``giraph`` flags (``-q -w -yh -yj``; any other key is rejected,
DGAConfiguration.java:45-51). The XML sections are parsed by
DGAXMLConfigurationParser.java (``configuration/{system,custom,giraph}/
property`` with ``name``/``value`` children; malformed entries raise).
Per-analytic wiring lives in DGARunner.java:87-170.

Spark-side mapping: ``system`` properties become SparkSession conf
entries, ``custom`` properties are the analytic knobs consumed by the
CLI/dispatch, and the restricted engine flags map to their local
equivalents (workers → parallelism, quiet → log level).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

# Well-known custom keys (names preserved from the reference so a
# dga-config.xml written for it keeps working):
# DGAAbstractEdgeInputFormat.java:43-63
EDGE_DELIMITER = "simple.edge.delimiter"
EDGE_VALUE_DEFAULT = "simple.edge.value.default"
EDGE_IGNORE_THIRD = "simple.edge.column.ignore"
EDGE_REVERSE_DUPLICATOR = "io.edge.reverse.duplicator"
# DGAAbstractEdgeOutputFormat.java:50-60
WRITE_VERTEX_VALUE = "write.vertex.value"
WRITE_EDGE_VALUE = "write.edge.value"
# HBSEConfigurationConstants.java
HBSE_SET_MAX_SIZE = "betweenness.set.maxSize"
HBSE_SET_STABILITY = "betweenness.set.stability"
HBSE_SET_STABILITY_COUNTER = "betweenness.set.stability.counter"
HBSE_OUTPUT_DIR = "betweenness.output.dir"
HBSE_PIVOT_BATCH_SIZE = "pivot.batch.size"
HBSE_PIVOT_BATCH_SIZE_INITIAL = "pivot.batch.size.initial"
HBSE_PIVOT_SEED = "pivot.batch.random.seed"
HBSE_TOTAL_PIVOT_COUNT = "vertex.count"
# LouvainMasterCompute.java:123-124
LOUVAIN_MIN_PROGRESS = "minimum.progress"
LOUVAIN_PROGRESS_TRIES = "progress.tries"
# DGALoggingUtil.java:29
DGA_LOG_LEVEL = "dga.log.level"

# The reference's public setGiraphProperty allows exactly these flags
# (DGAConfiguration.java:46); everything else must go through the
# system/custom namespaces.
_ALLOWED_ENGINE_KEYS = frozenset({"-q", "-w", "-yh", "-yj"})


@dataclass
class DGAConfig:
    """One configuration layer: three last-wins key→value namespaces."""

    system: dict[str, str] = field(default_factory=dict)
    custom: dict[str, str] = field(default_factory=dict)
    engine: dict[str, str] = field(default_factory=dict)

    def set_engine_property(self, key: str, value: str) -> None:
        """Restricted namespace — mirrors DGAConfiguration.java:45-51."""
        if key not in _ALLOWED_ENGINE_KEYS:
            raise ValueError(
                f"The key provided, {key}, is not allowed to be specified within DGA."
            )
        self.engine[key] = value

    def custom_int(self, key: str, default: int) -> int:
        try:
            return int(self.custom[key])
        except KeyError:
            return default

    def custom_float(self, key: str, default: float) -> float:
        try:
            return float(self.custom[key])
        except KeyError:
            return default

    def custom_bool(self, key: str, default: bool = False) -> bool:
        v = self.custom.get(key)
        return default if v is None else v.strip().lower() == "true"


def coalesce(*layers: DGAConfig) -> DGAConfig:
    """Merge layers lowest-priority first; the last layer wins every key
    collision (DGAConfiguration.coalesce, DGAConfiguration.java:187-196).
    """
    out = DGAConfig()
    for layer in layers:
        out.system.update(layer.system)
        out.custom.update(layer.custom)
        out.engine.update(layer.engine)
    return out


def parse_config_xml(source: str) -> DGAConfig:
    """Parse a ``dga-config.xml``-shaped document (path or XML string).

    Sections ``configuration/{system,custom,giraph}`` hold ``property``
    elements with ``name``/``value`` children
    (DGAXMLConfigurationParser.java; resource dga-config.xml:3-30). A
    property missing either child is malformed and raises, matching the
    reference's IOException.
    """
    root = (
        ET.parse(source).getroot()
        if not source.lstrip().startswith("<")
        else ET.fromstring(source)
    )
    conf = DGAConfig()
    for section, target in (
        ("system", conf.system),
        ("custom", conf.custom),
        ("giraph", conf.engine),
    ):
        for prop in root.findall(f"./{section}/property"):
            name = prop.findtext("name")
            value = prop.findtext("value")
            if name is None or value is None:
                raise ValueError(
                    "Malformed XML for the this DGA configuration file"
                )
            if section == "giraph":
                # file-level giraph flags carry no "-" in the reference
                # resource (<name>w</name>); normalize to flag form
                target[f"-{name}" if not name.startswith("-") else name] = value
            else:
                target[name] = value
    return conf


def parse_ca_args(pairs: list[str]) -> DGAConfig:
    """The command-line layer: repeated ``--ca key=value`` arguments
    (DGACommandLineUtil's ``-ca``; dga-graphx CommandLineParser.scala
    ``--ca`` and ``--S`` for system properties — system keys here use a
    ``spark.`` / ``S:`` prefix)."""
    conf = DGAConfig()
    for pair in pairs:
        key, sep, value = pair.partition("=")
        if not sep:
            raise ValueError(f"--ca expects key=value, got {pair!r}")
        key = key.strip()
        if key.startswith("S:"):
            conf.system[key[2:]] = value
        elif key.startswith("spark."):
            conf.system[key] = value
        else:
            conf.custom[key] = value
    return conf


def minimal_defaults(analytic: str, output_path: str | None = None) -> DGAConfig:
    """Layer 1 — the reference's hard-coded per-analytic minimal
    defaults (DGARunner.java:96-118: WCC writes the vertex value; HBSE
    seeds set size 10, pivot batches 10/10, pivot budget 5 and the
    output dir)."""
    conf = DGAConfig()
    if analytic == "wcc":
        conf.custom[WRITE_VERTEX_VALUE] = "true"
    elif analytic == "hbse":
        conf.custom[HBSE_SET_MAX_SIZE] = "10"
        conf.custom[HBSE_PIVOT_BATCH_SIZE] = "10"
        conf.custom[HBSE_PIVOT_BATCH_SIZE_INITIAL] = "10"
        conf.custom[HBSE_TOTAL_PIVOT_COUNT] = "5"
        if output_path:
            conf.custom[HBSE_OUTPUT_DIR] = output_path
    return conf


def required_conf(analytic: str) -> DGAConfig:
    """Layer 4 — analytic-required settings that trump everything
    (DGARunner.java requiredConf blocks). The input/output format
    class wiring collapses to sink selection on the Spark side; what
    survives as a real override is PR's forced vertex-value write
    (DGARunner.java:146)."""
    conf = DGAConfig()
    if analytic == "pr":
        conf.custom[WRITE_VERTEX_VALUE] = "true"
    return conf


def resolve(
    analytic: str,
    file_conf: DGAConfig | None = None,
    cli_conf: DGAConfig | None = None,
    output_path: str | None = None,
) -> DGAConfig:
    """The full 4-layer coalesce in reference order: minimal defaults <
    file < command line < analytic-required (DGARunner.java:99,119)."""
    return coalesce(
        minimal_defaults(analytic, output_path),
        file_conf or DGAConfig(),
        cli_conf or DGAConfig(),
        required_conf(analytic),
    )
