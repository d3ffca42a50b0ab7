"""Full-text search surface (reference: Elasticsearch queries in
etl/json/ETLTests-2.json) as DataFrame transforms."""
