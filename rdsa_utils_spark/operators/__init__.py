"""Relational + pipeline operators."""

from rdsa_utils_spark.operators.reshape import (  # noqa: F401
    flatten_struct_columns,
    melt,
    pack_struct_column,
    unpack_list_col,
)
from rdsa_utils_spark.operators.filters import (  # noqa: F401
    filter_out_values,
    map_column_names,
    map_column_values,
    set_nulls,
)
from rdsa_utils_spark.operators.joins import (  # noqa: F401
    asof_join,
    join_multi_dfs,
    range_join,
)
from rdsa_utils_spark.operators.sets import (  # noqa: F401
    union_mismatched_dfs,
    union_multi_dfs,
)
from rdsa_utils_spark.operators.windows import (  # noqa: F401
    drop_duplicates_reproducible,
    get_window_spec,
    rank_numeric,
    select_first_obs_appearing_in_group,
)
from rdsa_utils_spark.operators.aggregations import (  # noqa: F401
    aggregate_col,
    count_nulls,
    distinct_values,
    get_unique,
    sum_columns,
)
from rdsa_utils_spark.operators.text import (  # noqa: F401
    bpe_ish_token_count,
    token_count,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_text_stats,
)
from rdsa_utils_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    lsh_candidate_pairs,
    minhash_near_dedup,
    minhash_signatures,
    simhash_signatures,
)
from rdsa_utils_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine,
    cosine_near_dup_pairs,
    lsh_bucketed_topk,
)
from rdsa_utils_spark.operators.multimodal import (  # noqa: F401
    attach_binary_payload,
    extract_image_metadata,
    sample_frames,
)
from rdsa_utils_spark.operators.windows import top_k_per_group  # noqa: F401
from rdsa_utils_spark.operators.sampling import (  # noqa: F401
    cap_per_group,
    deterministic_split,
    hash_uniform,
    pack_sequences,
    stratified_sample,
    vocabulary,
)
from rdsa_utils_spark.operators.events import (  # noqa: F401
    cohort_retention,
    fill_time_gaps,
    funnel_counts,
)
from rdsa_utils_spark.operators.search import (  # noqa: F401
    bm25_topk,
    tf_idf_top_terms,
)
from rdsa_utils_spark.operators.similarity import (  # noqa: F401
    normalize_vectors,
    quantize_int8,
    sq8_quantize,
    sq8_topk,
    sq8_train,
)
from rdsa_utils_spark.operators.quality import (  # noqa: F401
    Check,
    frame_diff,
    profile_columns,
    referential_violations,
    run_checks,
    unique_violations,
)
from rdsa_utils_spark.operators.stats import (  # noqa: F401
    kaplan_meier,
    weighted_quantiles,
)
from rdsa_utils_spark.operators.text import (  # noqa: F401
    canonical_url,
    domain_stats,
    url_dedup,
    url_host,
)
from rdsa_utils_spark.operators.graph import label_propagation  # noqa: F401
