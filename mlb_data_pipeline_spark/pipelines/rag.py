"""Entry point B — interactive RAG retrieval (SURVEY §3.2).

Reference: rag_pipeline(query_str) (pipeline.py:95-140): embed query ->
collection.query(n_results=3) -> "\\n\\n".join(docs) -> LLM. The engine's
physical plan: embed the query driver-side (one vector), broadcast it
through a literal, narrow scan+score over the store, TakeOrdered(k),
then the U6 enrichment operator for generation (mocked by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.embed import fake_encode
from ..operators.enrich import MockLLMClient, llm_enrich
from ..operators.vector import context_assembly, cosine_topk


def retrieve(spark: SparkSession, store: DataFrame, query_text: str, k: int = 3) -> DataFrame:
    """Top-k docs for a text query against an embedded store
    (id, text, embedding). No shuffle until the final TakeOrdered(k)."""
    qvec = fake_encode(query_text)
    topk = cosine_topk(store, qvec, "url", "embedding", k)
    # k rows at this point — the global window is a no-op shuffle-wise
    return topk.withColumn("rank", F.row_number().over(Window.orderBy(F.col("sim").desc(), F.col("url"))))


def rag_answer(spark: SparkSession, store: DataFrame, question: str, k: int = 3, client_factory=MockLLMClient) -> DataFrame:
    """retrieve -> context assembly -> (mock) LLM completion. Returns a
    1-row frame (context, n_docs, prompt, completion)."""
    ranked = retrieve(spark, store, question, k)
    ctx = context_assembly(ranked.select("rank", F.col("text")), "text", "rank")
    prompt = ctx.withColumn(
        "prompt",
        F.concat(F.lit("Context:\n"), F.col("context"), F.lit(f"\n\nQuestion: {question}\nAnswer:")),
    )
    return llm_enrich(prompt, "prompt", client_factory=client_factory)
