from .daily import daily_content_pipeline  # noqa: F401
from .pretraining import pretraining_data_pipeline  # noqa: F401
from .rag import rag_answer, retrieve  # noqa: F401
