from .transcripts import SCALES, gen_queries, gen_transcripts, load_transcripts

__all__ = ["SCALES", "gen_transcripts", "gen_queries", "load_transcripts"]
