from udacity_data_engineering_capstone_project_spark.functions.dates import (
    sas_date_to_date,
    with_date_parts,
)
from udacity_data_engineering_capstone_project_spark.functions.keys import (
    add_surrogate_key,
)
from udacity_data_engineering_capstone_project_spark.functions.strings import (
    extract_decimal,
    printf_round0,
    split_item,
)
from udacity_data_engineering_capstone_project_spark.functions.text import (
    char_shingles,
    normalize_text,
    tokens,
)
from udacity_data_engineering_capstone_project_spark.functions.robots import (
    filter_robots_disallowed,
    parse_robots_txt,
    robots_allowed,
    robots_rules_df,
    with_robots_verdict,
)
from udacity_data_engineering_capstone_project_spark.functions.urls import (
    canonicalize_url,
    extract_links,
    domain_counts,
    filter_blocked_domains,
    load_psl_rules,
    load_public_suffixes,
    registered_domain,
    url_host,
    url_path,
    with_registered_domain,
)

__all__ = [
    "extract_links",
    "filter_robots_disallowed",
    "parse_robots_txt",
    "robots_allowed",
    "robots_rules_df",
    "with_robots_verdict",
    "canonicalize_url",
    "domain_counts",
    "filter_blocked_domains",
    "load_psl_rules",
    "load_public_suffixes",
    "registered_domain",
    "url_host",
    "url_path",
    "with_registered_domain",
    "sas_date_to_date",
    "with_date_parts",
    "add_surrogate_key",
    "extract_decimal",
    "printf_round0",
    "split_item",
    "char_shingles",
    "normalize_text",
    "tokens",
]
