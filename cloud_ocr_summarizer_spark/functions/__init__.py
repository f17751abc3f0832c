from cloud_ocr_summarizer_spark.functions.text import (  # noqa: F401
    classify_kind_col,
    mime_for_name_col,
    normalize_block_text_col,
    token_count_col,
    whitespace_tokens_col,
)
