from .search import SearchSpec, compile_search, parse_search_url

__all__ = ["SearchSpec", "compile_search", "parse_search_url"]
