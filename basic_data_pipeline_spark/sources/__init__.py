"""Sources: fixture parquet catalog (see catalog.py), synthetic Debezium
envelopes, and gated Kafka/JDBC connectors."""
