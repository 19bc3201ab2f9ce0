"""Sources & sinks: parquet/CSV/JSON readers, table writers, catalog."""

from rdsa_utils_spark.sources.readers import (  # noqa: F401
    build_sql_query,
    load_and_validate_table,
    load_csv,
    load_json,
    read_parquet,
    read_table,
    register_tables,
)
from rdsa_utils_spark.sources.writers import (  # noqa: F401
    insert_df_to_table,
    save_single_file_csv,
    truncate_table,
    write_and_read_table,
    write_table,
)
from rdsa_utils_spark.sources.catalog import (  # noqa: F401
    extract_database_name,
    get_current_database,
    get_tables_in_database,
    table_exists,
)
