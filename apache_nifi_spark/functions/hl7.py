"""ExtractHL7Attributes (§2.4 [2.7.2-surface, nifi-hl7 bundle]): HL7 v2
pipe-and-hat messages — segments separated by carriage returns, fields
by ``|``, components by ``^`` — parsed as pure column expressions.

The processor's contract is attribute extraction from the standard
segments: message type and control id from MSH, patient id/name from
PID, observation value/units from OBX.  Each extraction is a
segment-prefix filter over the split segment array plus positional
field/component indexing — whole-stage codegen, no UDF, and the same
split/index algebra expresses in any SQL engine, so the operator
value-oracles.

Notes: HL7's MSH segment is special-cased per the spec — the field
separator itself occupies MSH-1, so field indexes in MSH are shifted
by one relative to every other segment (this module follows the spec
numbering).  Repetition (``~``) and escape (``\\``) handling are out of
scope for the extraction subset (documented), as in the NiFi
processor's flatten-less mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hl7_segment", "hl7_field", "hl7_component", "extract_hl7_attributes"]


def hl7_segment(msg: Column, seg_id: str) -> Column:
    """The first segment whose id is ``seg_id`` ('' when absent)."""
    segs = F.split(msg, "\r", -1)
    hits = F.filter(segs, lambda s: F.split(s, r"\|", -1)[0] == seg_id)
    return F.coalesce(F.try_element_at(hits, F.lit(1)), F.lit(""))


def hl7_field(segment: Column, n: int, msh: bool = False) -> Column:
    """Field ``n`` per spec numbering.  For MSH, MSH-1 IS the field
    separator and MSH-2 the encoding characters; positions shift."""
    idx = n if msh else n + 1
    if msh and n == 1:
        return F.when(F.length(segment) >= 4, F.lit("|")).otherwise(F.lit(""))
    arr = F.split(segment, r"\|", -1)
    return F.coalesce(F.try_element_at(arr, F.lit(idx)), F.lit(""))


def hl7_component(field: Column, n: int) -> Column:
    arr = F.split(field, r"\^", -1)
    return F.coalesce(F.try_element_at(arr, F.lit(n)), F.lit(""))


def extract_hl7_attributes(df: DataFrame, content_col: str = "content") -> DataFrame:
    """The standard attribute set: MSH-9 message type (code^event),
    MSH-10 control id, PID-3 patient id, PID-5 name (family^given),
    OBX-3 observation id, OBX-5 value, OBX-6 units."""
    msg = F.col(content_col)
    msh = hl7_segment(msg, "MSH")
    pid = hl7_segment(msg, "PID")
    obx = hl7_segment(msg, "OBX")
    msg_type = hl7_field(msh, 9, msh=True)
    pid_name = hl7_field(pid, 5)
    return df.withColumns(
        {
            "message_code": hl7_component(msg_type, 1),
            "trigger_event": hl7_component(msg_type, 2),
            "message_control_id": hl7_field(msh, 10, msh=True),
            "patient_id": hl7_component(hl7_field(pid, 3), 1),
            "patient_family_name": hl7_component(pid_name, 1),
            "patient_given_name": hl7_component(pid_name, 2),
            "observation_id": hl7_component(hl7_field(obx, 3), 1),
            "observation_value": hl7_field(obx, 5),
            "observation_units": hl7_component(hl7_field(obx, 6), 1),
        }
    )
