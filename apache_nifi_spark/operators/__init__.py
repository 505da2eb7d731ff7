"""Processor inventory of the NiFi 2.7.2 engine, re-expressed as composable
DataFrame operators (SURVEY.md §2).  Each module documents which processors
it covers and how the Spark plan differs (for the better) from NiFi's
operator-at-a-time execution."""

from apache_nifi_spark.operators.route import (  # noqa: F401
    route_on_attribute,
    distribute_load,
    duplicate_flowfile,
    route_text,
    query_record,
    scan_attribute,
    validate_record,
)
from apache_nifi_spark.operators.transform import (  # noqa: F401
    update_record,
    rename_fields,
    remove_fields,
    extract_text,
    replace_text,
    replace_text_with_mapping,
    flatten_json,
    attributes_to_json,
    attributes_to_csv,
    evaluate_json_path,
    evaluate_xpath,
    filter_attributes,
    convert_character_set,
    split_json,
    transform_xml,
    parse_syslog,
    parse_syslog_5424,
    convert_json_to_sql,
    render_syslog_3164,
    render_syslog_5424,
)
from apache_nifi_spark.operators.join import (  # noqa: F401
    lookup_record,
    lookup_split,
    join_enrichment,
    join_enrichment_sql,
    range_join,
    asof_join,
    join_zip,
)
from apache_nifi_spark.operators.aggregate import (  # noqa: F401
    cdc_apply_changes,
    merge_record,
    defragment,
    calculate_record_stats,
    partition_record,
    deduplicate_record,
    split_record,
)
from apache_nifi_spark.operators.window import (  # noqa: F401
    enforce_order,
    rolling_window,
    top_k_per_group,
    rank_records,
    monitor_activity,
)
from apache_nifi_spark.operators.setops import (  # noqa: F401
    funnel,
    distinct_union,
    intersect_records,
    except_records,
)
from apache_nifi_spark.operators.sample import (  # noqa: F401
    sample_interval,
    sample_probabilistic,
    sample_reservoir,
    control_rate_limit,
)
from apache_nifi_spark.operators.scripted import (  # noqa: F401
    flowfile_transform,
    record_transform,
    scripted_aggregate,
    execute_stream_command,
)
from apache_nifi_spark.operators.skew import (  # noqa: F401
    salted_join,
    salted_aggregate,
    salted_join_auto,
    detect_join_skew,
)
from apache_nifi_spark.operators.content import (  # noqa: F401
    pack_content_zip,
    unpack_content_zip,
    pack_content_tar,
    unpack_content_tar,
    pack_flowfile_v3,
    unpack_flowfile_v3,
    compress_content,
    decompress_content,
    merge_content_text,
)
from apache_nifi_spark.operators.http import invoke_http  # noqa: F401,E402
from apache_nifi_spark.operators.pgp import (  # noqa: F401,E402
    decrypt_content_pgp,
    encrypt_content_pgp,
)
