from katago_tpu.book.book import Book, BookMove, BookNode  # noqa: F401
