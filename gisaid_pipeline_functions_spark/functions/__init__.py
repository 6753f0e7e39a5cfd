from .weeks import sunday_week_start, week_label, week_spine
from .strings import count_occurrences, natural_sort_key, x_content

__all__ = [
    "sunday_week_start",
    "week_label",
    "week_spine",
    "count_occurrences",
    "natural_sort_key",
    "x_content",
]
