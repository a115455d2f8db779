"""Explicit schemas for the 6 bronze sources + silver/gold tables.

The reference declares every schema in DDL (no inference):
bronze ref: scripts/bronze/ddl_bronze.sql:16-90
silver ref: scripts/silver/ddl_silver.sql:22-147
gold   ref: scripts/gold/ddl_gold.sql:27-130

MONEY → DecimalType(19,4) (ddl_bronze.sql:53-55 "Changed from INT to MONEY
for precision"); arithmetic stays decimal so sums are exact and
order-independent under distributed aggregation.
"""

from __future__ import annotations

from pyspark.sql import types as T

MONEY_T = T.DecimalType(19, 4)

# ---------------------------------------------------------------- bronze ---

# ref: ddl_bronze.sql:16-24
CRM_CUST_INFO = T.StructType(
    [
        T.StructField("cst_id", T.IntegerType()),
        T.StructField("cst_key", T.StringType()),
        T.StructField("cst_firstname", T.StringType()),
        T.StructField("cst_lastname", T.StringType()),
        T.StructField("cst_marital_status", T.StringType()),
        T.StructField("cst_gndr", T.StringType()),
        T.StructField("cst_create_date", T.DateType()),
    ]
)

# ref: ddl_bronze.sql:31-39 (prd_start_dt/prd_end_dt arrive as dd-MM-yyyy
# strings in the raw CSV — parsed in the silver layer, kept raw here)
CRM_PRD_INFO = T.StructType(
    [
        T.StructField("prd_id", T.IntegerType()),
        T.StructField("prd_key", T.StringType()),
        T.StructField("prd_nm", T.StringType()),
        T.StructField("prd_cost", T.IntegerType()),
        T.StructField("prd_line", T.StringType()),
        T.StructField("prd_start_dt", T.StringType()),
        T.StructField("prd_end_dt", T.StringType()),
    ]
)

# ref: ddl_bronze.sql:46-56 (dates are INT yyyymmdd at this layer)
CRM_SALES_DETAILS = T.StructType(
    [
        T.StructField("sls_ord_num", T.StringType()),
        T.StructField("sls_prd_key", T.StringType()),
        T.StructField("sls_cust_id", T.IntegerType()),
        T.StructField("sls_order_dt", T.IntegerType()),
        T.StructField("sls_ship_dt", T.IntegerType()),
        T.StructField("sls_due_dt", T.IntegerType()),
        T.StructField("sls_sales", MONEY_T),
        T.StructField("sls_quantity", T.IntegerType()),
        T.StructField("sls_price", MONEY_T),
    ]
)

# ref: ddl_bronze.sql:63-66
ERP_LOC_A101 = T.StructType(
    [
        T.StructField("cid", T.StringType()),
        T.StructField("cntry", T.StringType()),
    ]
)

# ref: ddl_bronze.sql:73-77
ERP_CUST_AZ12 = T.StructType(
    [
        T.StructField("cid", T.StringType()),
        T.StructField("bdate", T.DateType()),
        T.StructField("gen", T.StringType()),
    ]
)

# ref: ddl_bronze.sql:84-89
ERP_PX_CAT_G1V2 = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("cat", T.StringType()),
        T.StructField("subcat", T.StringType()),
        T.StructField("maintenance", T.StringType()),
    ]
)

BRONZE_SCHEMAS: dict[str, T.StructType] = {
    "crm_cust_info": CRM_CUST_INFO,
    "crm_prd_info": CRM_PRD_INFO,
    "crm_sales_details": CRM_SALES_DETAILS,
    "erp_loc_a101": ERP_LOC_A101,
    "erp_cust_az12": ERP_CUST_AZ12,
    "erp_px_cat_g1v2": ERP_PX_CAT_G1V2,
}

# CSV file name per bronze table (ref: proc_load_bronze.sql:36-136)
BRONZE_CSV_FILES: dict[str, str] = {
    "crm_cust_info": "cust_info.csv",
    "crm_prd_info": "prd_info.csv",
    "crm_sales_details": "sales_details.csv",
    "erp_loc_a101": "LOC_A101.csv",
    "erp_cust_az12": "CUST_AZ12.csv",
    "erp_px_cat_g1v2": "PX_CAT_G1V2.csv",
}
