from .engine import IndexReader, BatchSearcher  # noqa: F401
from .dsl import (  # noqa: F401
    run_analyze,
    run_count,
    run_explain,
    run_field_caps,
    run_get_mapping,
    run_get_settings,
    run_mget,
    run_msearch,
    run_query,
    run_query_multi,
    run_query_multi_dfs,
    run_scroll,
    run_stats,
    run_termvectors,
    run_validate_query,
)
from .querystring import parse_query_string, query_string_hits  # noqa: F401
from .rankeval import run_rank_eval  # noqa: F401
from .searchtemplate import (  # noqa: F401
    delete_script,
    get_script,
    put_script,
    render_template,
    run_search_template,
)
from .cat import cat_aliases, cat_count, cat_indices, cat_templates  # noqa: F401
