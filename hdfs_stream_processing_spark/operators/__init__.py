"""Composable DataFrame → DataFrame operators (SURVEY §2.2-2.7, §2.10).

Every operator is a plain function over DataFrames so the same code path
serves batch and Structured Streaming plans, and Catalyst sees one
declarative plan to optimize (pushdown, pruning, join selection) — no
hand-scheduling, no RDDs.
"""

from hdfs_stream_processing_spark.operators.relational import (  # noqa: F401
    add_lit,
    case_when,
    drop_nulls,
    limit_n,
    multi_join,
    project_exclude,
    sort_by,
    top_k,
    union_by_name,
)
from hdfs_stream_processing_spark.operators.aggregates import (  # noqa: F401
    approx_distinct,
    count_distinct,
    count_rows,
    group_agg,
    rollup_agg,
)
from hdfs_stream_processing_spark.operators.windows import (  # noqa: F401
    window_rank,
    window_running,
)
from hdfs_stream_processing_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash,
)
from hdfs_stream_processing_spark.operators.similarity import (  # noqa: F401
    ivf_topk,
    lsh_bucket_topk,
    similarity_topk,
    similarity_topk_np,
)
from hdfs_stream_processing_spark.operators.text import (  # noqa: F401
    build_search_index,
    explode_edge_ngrams,
    fingerprint,
    lang_id,
    quality_score,
    search_prefix,
    text_stats,
    token_count,
)
from hdfs_stream_processing_spark.operators.multimodal import (  # noqa: F401
    attach_payload,
    extract_features,
    payload_meta,
)
from hdfs_stream_processing_spark.operators.skew import salted_group_sum  # noqa: F401
from hdfs_stream_processing_spark.operators.layout import (  # noqa: F401
    z_order_key,
    zorder_write,
)
from hdfs_stream_processing_spark.operators.llmdata import (  # noqa: F401
    chunk_documents,
    decontaminate,
    mix_sources,
    redact_pii,
    repetition_stats,
    resample_sources,
    shard_assign,
)
from hdfs_stream_processing_spark.operators.analytics import (  # noqa: F401
    anomaly_zscore,
    funnel_steps,
    retention_cohorts,
    sessionize,
)
from hdfs_stream_processing_spark.operators.aggregates import (  # noqa: F401
    corr_exact,
    heavy_hitters,
)
from hdfs_stream_processing_spark.operators.temporal import (  # noqa: F401
    gapfill_interpolate,
    gapfill_locf,
)
