from .tags import add_tag, strip_tag_prefix  # noqa: F401
from .time import format_event_time, lenient_to_timestamp  # noqa: F401
