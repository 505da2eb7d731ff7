"""Scoped NiFi flow-definition (flow.json) import → composed DataFrame plan.

The reference deployment's core workflow is versioned flow.json snapshots
pushed through NiFi Registry (/root/reference/nifi-registry/
deployement.yaml:14-16); this module ingests such a snapshot — the
``flowContents`` process-group shape of the public flow-definition format —
and compiles the processor graph onto the operators this engine already
implements, producing one lazy DataFrame per dangling output relationship.

Scope (documented): processors whose analogs exist here —

=====================  ====================================================
GetFile / GenerateFlowFile   fixture-table scan (``Input Directory`` names
                             the table; SURVEY.md §2.1)
RouteOnAttribute             dynamic properties are EL *strings*, compiled
                             by functions/el_parser (§2.3)
UpdateAttribute              dynamic properties are EL strings → derived
                             columns (§2.4)
QueryRecord                  dynamic properties are SQL against FLOWFILE
                             (§2.3/§2.5)
LookupRecord                 broadcast-join enrichment against another
                             fixture table (§2.6)
Funnel                       implicit — multiple connections into one
                             processor union (§2.8)
PutFile                      terminal pass-through (optionally writes
                             parquet when ``Directory`` is an absolute
                             path) (§2.2)
ReplaceText / ExtractText    regex replace / capture-to-attributes (§2.4)
RouteText / RouteOnContent   content-regex matched/unmatched split (§2.3)
DistributeLoad               weighted round-robin → one output per
                             relationship (§2.3)
DuplicateFlowFile            copy.index fan-out (§2.3)
TransformXml                 inline ``XSLT Stylesheet`` property compiled
                             by functions/xslt (§2.4)
ValidateJson                 inline ``Schema Text`` compiled by
                             functions/json_schema → valid/invalid (§2.3)
GeohashRecord                lat/lon record paths → geohash column
                             (functions/geo, §2.4)
ParseCEF                     CEF header/extension parse (functions/cef)
CountText                    line/word/char counter columns (§2.4)
ForkRecord                   array record-path → per-element child rows
                             keeping parent fields (§2.5)
GenerateRecord               deterministic synthetic source (§2.1)
ValidateXml                  structural contract → valid/invalid (§2.3)
VerifyContentMAC             HMAC route → success/failure (§2.4)
=====================  ====================================================

Composition is purely declarative: the importer never executes anything —
it builds one Catalyst plan per output, so filter pushdown/column pruning
work across *processor* boundaries, something NiFi's FlowFile-at-a-time
runtime cannot do.  At 100 TB the imported flow runs exactly like a
hand-written pipeline (broadcast lookups, pushed-down routes), because it
*is* one.
"""

from __future__ import annotations

import json
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.functions.el_parser import compile_el, el_predicate

__all__ = ["run_flow", "run_flow_json", "FlowImportError"]


class FlowImportError(ValueError):
    """Unsupported or malformed flow definition."""


def run_flow_json(spark: SparkSession, sf_dir: str, text: str) -> dict[str, DataFrame]:
    """Parse flow.json text (e.g. a FlowRegistry-pinned snapshot) and run it."""
    return run_flow(spark, sf_dir, json.loads(text))


def run_flow(spark: SparkSession, sf_dir: str, flow: dict) -> dict[str, DataFrame]:
    """Compile a flow snapshot to DataFrames.

    Returns ``{"<processor name>.<relationship>": DataFrame}`` for every
    relationship that has no outgoing connection (the flow's outputs).
    """
    contents = flow.get("flowContents", flow)
    procs = {p["identifier"]: p for p in contents.get("processors", [])}
    if not procs:
        raise FlowImportError("flow has no processors")
    conns = contents.get("connections", [])

    incoming: dict[str, list[tuple[str, str]]] = defaultdict(list)
    outgoing: dict[str, set[str]] = defaultdict(set)  # pid → rels consumed
    for c in conns:
        src = c["source"]["id"]
        dst = c["destination"]["id"]
        if src not in procs or dst not in procs:
            raise FlowImportError(f"connection references unknown processor: {c}")
        rels = c.get("selectedRelationships") or ["success"]
        for rel in rels:
            incoming[dst].append((src, rel))
            outgoing[src].add(rel)

    # topological order (Kahn) — flow graphs must be acyclic
    indeg = {pid: 0 for pid in procs}
    for dst, srcs in incoming.items():
        indeg[dst] = len(srcs)
    ready = sorted(pid for pid, d in indeg.items() if d == 0)
    order: list[str] = []
    deps_left = dict(indeg)
    while ready:
        pid = ready.pop(0)
        order.append(pid)
        for dst, srcs in incoming.items():
            n = sum(1 for s, _ in srcs if s == pid)
            if n:
                deps_left[dst] -= n
                if deps_left[dst] == 0:
                    ready.append(dst)
        ready.sort()
    if len(order) != len(procs):
        raise FlowImportError("flow graph has a cycle")

    outputs: dict[str, dict[str, DataFrame]] = {}
    for pid in order:
        proc = procs[pid]
        ins = [outputs[src][rel] for src, rel in incoming.get(pid, [])
               if rel in outputs.get(src, {})]
        df = None
        if ins:
            df = ins[0]
            for other in ins[1:]:  # Funnel semantics: UNION ALL by name
                df = df.unionByName(other)
        outputs[pid] = _apply(spark, sf_dir, proc, df)

    result: dict[str, DataFrame] = {}
    for pid, rels in outputs.items():
        name = procs[pid].get("name") or pid
        for rel, df in rels.items():
            if rel not in outgoing.get(pid, set()):
                result[f"{name}.{rel}"] = df
    return result


# ------------------------------------------------------------- processors ---

#: properties that are configuration, not dynamic user expressions
_STATIC_PROPS = {
    "Routing Strategy", "routing-strategy",
    "Input Directory", "Directory", "Keep Source File",
    "Record Reader", "Record Writer", "record-reader", "record-writer",
    "Lookup Table", "Lookup Key", "Lookup Field", "Result Key", "Lookup Columns",
    "Delete Attributes Expression", "Store State",
    "Schema Text", "JSON Schema", "Column", "Latitude Record Path",
    "Longitude Record Path", "Geohash Level", "Geohash Record Path",
    "Record Path", "Fork Path", "Number of Records", "Root Tag",
    "Required Elements", "MAC Key", "MAC Column",
    "include-zero-record-flowfiles", "Cache Schema",
}


def _dynamic(props: dict) -> dict:
    return {k: v for k, v in (props or {}).items() if k not in _STATIC_PROPS}


def _apply(
    spark: SparkSession, sf_dir: str, proc: dict, df: DataFrame | None
) -> dict[str, DataFrame]:
    ptype = proc.get("type", "").rsplit(".", 1)[-1]
    props = proc.get("properties") or {}
    name = proc.get("name") or proc.get("identifier")

    if ptype in ("GetFile", "GenerateFlowFile", "ListFile", "FetchFile"):
        table = props.get("Input Directory")
        if table not in io.TABLES:
            raise FlowImportError(
                f"{name}: 'Input Directory' must name a fixture table, got {table!r}"
            )
        return {"success": io.load_table(spark, sf_dir, table)}

    if ptype == "GenerateRecord":
        n = int(props.get("Number of Records", "100"))
        base = spark.range(0, n).select(F.col("id").alias("rec_id"))
        h = F.md5(F.concat(F.lit("gr:"), F.col("rec_id").cast("string")))
        return {
            "success": base.select(
                "rec_id",
                (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 10000)
                .alias("amount"),
                F.substring(h, 9, 8).alias("token"),
            )
        }

    if df is None:
        raise FlowImportError(f"{name}: non-source processor has no input")

    if ptype == "RouteOnAttribute":
        from apache_nifi_spark.operators.route import route_on_attribute

        routes = {rel: el_predicate(src) for rel, src in _dynamic(props).items()}
        if not routes:
            raise FlowImportError(f"{name}: RouteOnAttribute needs EL properties")
        strategy = props.get("Routing Strategy", "Route to Property name")
        mapped = (
            "route_first_matching"
            if "Property name" in strategy
            else "route_all_matching"
        )
        return route_on_attribute(df, routes, strategy=mapped)

    if ptype == "UpdateAttribute":
        from apache_nifi_spark.functions.el_parser import el_select

        exprs = {k: v for k, v in _dynamic(props).items()}
        return {"success": el_select(df, exprs)}

    if ptype == "QueryRecord":
        out: dict[str, DataFrame] = {}
        for rel, sql_text in _dynamic(props).items():
            # spark.sql analyzes eagerly, so the view binding is captured
            # per-statement — later FLOWFILE rebinds don't disturb it.
            df.createOrReplaceTempView("FLOWFILE")
            out[rel] = spark.sql(sql_text)
        if not out:
            raise FlowImportError(f"{name}: QueryRecord needs SQL properties")
        return out

    if ptype == "LookupRecord":
        table = props.get("Lookup Table")
        key = props.get("Lookup Key")
        field = props.get("Lookup Field", key)  # lookup-side column
        if table not in io.TABLES or not key:
            raise FlowImportError(
                f"{name}: LookupRecord needs 'Lookup Table' (fixture) + 'Lookup Key'"
            )
        lookup = io.load_table(spark, sf_dir, table)
        cols = props.get("Lookup Columns")
        if cols:
            keep = [c.strip() for c in cols.split(",")]
            lookup = lookup.select(*dict.fromkeys([field, *keep]))
        cond = df[key] == lookup[field]
        matched = df.join(F.broadcast(lookup), on=cond, how="inner")
        unmatched = df.join(F.broadcast(lookup), on=cond, how="left_anti")
        return {"matched": matched, "unmatched": unmatched}

    if ptype == "ReplaceText":
        col = props.get("Column", "text")
        pattern = props.get("Regular Expression")
        repl = props.get("Replacement Value", "")
        if pattern is None:
            raise FlowImportError(f"{name}: ReplaceText needs 'Regular Expression'")
        from apache_nifi_spark.operators.transform import replace_text

        return {"success": replace_text(df, col, pattern, repl)}

    if ptype == "ExtractText":
        col = props.get("Column", "text")
        from apache_nifi_spark.operators.transform import extract_text

        pats = {out: (rx, 1) for out, rx in _dynamic(props).items()}
        if not pats:
            raise FlowImportError(f"{name}: ExtractText needs regex properties")
        return {"matched": extract_text(df, col, pats)}

    if ptype in ("RouteText", "RouteOnContent"):
        col = props.get("Column", "text")
        rx = props.get("Regular Expression") or props.get(
            "Matching Expression"
        )
        if rx is None:
            raise FlowImportError(f"{name}: {ptype} needs a regex property")
        matched = df.filter(F.col(col).rlike(rx))
        return {"matched": matched, "unmatched": df.filter(~F.col(col).rlike(rx))}

    if ptype == "DistributeLoad":
        from apache_nifi_spark.operators.route import distribute_load

        weights = {
            rel: int(w)
            for rel, w in _dynamic(props).items()
            if rel != "Order Column"
        }
        order = props.get("Order Column")
        if not weights or not order:
            raise FlowImportError(
                f"{name}: DistributeLoad needs weight properties + 'Order Column'"
            )
        routed = distribute_load(df, weights, order)
        return {
            rel: routed.filter(F.col("relationship") == rel).drop("relationship")
            for rel in weights
        }

    if ptype == "DuplicateFlowFile":
        from apache_nifi_spark.operators.route import duplicate_flowfile

        n = int(props.get("Number of Copies", "1"))
        return {"success": duplicate_flowfile(df, n)}

    if ptype == "TransformXml":
        from apache_nifi_spark.functions.xslt import xslt_compile
        from apache_nifi_spark.operators.transform import transform_xml

        xsl = props.get("XSLT Stylesheet")
        col = props.get("Column", "xml")
        if not xsl:
            raise FlowImportError(
                f"{name}: TransformXml needs the inline 'XSLT Stylesheet' property"
            )
        return {"success": transform_xml(df, col, xslt_compile(xsl))}

    if ptype == "ValidateJson":
        from apache_nifi_spark.functions.json_schema import validate_json

        schema_text = props.get("Schema Text") or props.get("JSON Schema")
        col = props.get("Column", "content")
        if not schema_text:
            raise FlowImportError(f"{name}: ValidateJson needs 'Schema Text'")
        out_df = validate_json(df, json.loads(schema_text), doc_col=col)
        return {
            "valid": out_df.filter(F.col("valid")).drop("valid", "validation_error"),
            "invalid": out_df.filter(~F.col("valid")).drop("valid"),
        }

    if ptype == "GeohashRecord":
        from apache_nifi_spark.functions.geo import geohash_record

        lat = props.get("Latitude Record Path", "lat")
        lon = props.get("Longitude Record Path", "lon")
        precision = int(props.get("Geohash Level", "8"))
        out_col = props.get("Geohash Record Path", "geohash")
        return {
            "success": geohash_record(
                df, lat_col=lat, lon_col=lon, precision=precision, out_col=out_col
            )
        }

    if ptype == "ParseCEF":
        from apache_nifi_spark.functions.cef import parse_cef

        col = props.get("Column", "content")
        return {"success": parse_cef(df, content_col=col)}

    if ptype == "CountText":
        col = props.get("Column", "text")
        body = F.col(col)
        lines = F.split(body, "\n", -1)
        words = F.filter(F.split(body, r"\s+", -1), lambda t: t != "")
        return {
            "success": df.withColumns(
                {
                    "text.line.count": F.size(lines).cast("int"),
                    "text.word.count": F.size(words).cast("int"),
                    "text.character.count": F.length(body).cast("int"),
                }
            )
        }

    if ptype == "ForkRecord":
        col = props.get("Record Path") or props.get("Fork Path")
        if not col:
            raise FlowImportError(f"{name}: ForkRecord needs 'Record Path'")
        keep = [c for c in df.columns if c != col]
        return {
            "fork": df.select(
                *keep, F.posexplode(F.col(col)).alias("pos", "element")
            )
        }

    if ptype == "ValidateXml":
        from apache_nifi_spark.sources.xml_codec import validate_xml

        col = props.get("Column", "content")
        root = props.get("Root Tag")
        req = tuple(
            s.strip()
            for s in (props.get("Required Elements") or "").split(",")
            if s.strip()
        )
        out_df = validate_xml(df, content_col=col, root_tag=root,
                              required_elements=req)
        return {
            "valid": out_df.filter(F.col("valid")).drop("valid", "validation_error"),
            "invalid": out_df.filter(~F.col("valid")).drop("valid"),
        }

    if ptype == "VerifyContentMAC":
        from apache_nifi_spark.functions.mac import verify_content_mac

        key = (props.get("MAC Key") or "").encode()
        if not key:
            raise FlowImportError(f"{name}: VerifyContentMAC needs 'MAC Key'")
        out_df = verify_content_mac(
            df, key,
            content_col=props.get("Column", "content"),
            mac_col=props.get("MAC Column", "mac"),
        )
        return {
            "success": out_df.filter(F.col("mac_ok")).drop("mac_ok", "computed_mac"),
            "failure": out_df.filter(~F.col("mac_ok")).drop("mac_ok"),
        }

    if ptype == "PutFile":
        directory = props.get("Directory", "")
        if directory.startswith("/"):
            df.write.mode("overwrite").parquet(directory)
        return {"success": df}

    raise FlowImportError(
        f"{name}: unsupported processor type {ptype!r} (scoped import; see module doc)"
    )
