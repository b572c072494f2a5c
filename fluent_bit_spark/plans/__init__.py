"""Pipeline plan construction & execution (SURVEY.md §3.4): spec →
lazily-composed DataFrame stages → persist → N sink writes → metrics →
checkpoint commit."""
