from pdf_extractor_spark.gen.transcripts import generate_transcripts  # noqa: F401
