from .webpages import synthesize_webpages, webpages_from_documents

__all__ = ["synthesize_webpages", "webpages_from_documents"]
