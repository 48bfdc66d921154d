"""End-to-end query plans: warehouse build (dims + fact), analytics
queries (A5-A8 + headline benchmark set), all over the driver testdata."""
