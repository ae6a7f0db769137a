"""Sources: synthetic webtext corpus, record readers, query parsing."""
