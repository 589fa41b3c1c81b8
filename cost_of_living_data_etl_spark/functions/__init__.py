from .columns import decomma_to_double, with_county_suffix, uppercase_columns

__all__ = ["decomma_to_double", "with_county_suffix", "uppercase_columns"]
