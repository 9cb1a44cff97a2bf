package software.amazon.awssdk.services.dynamodb.model;

public enum BillingMode { PROVISIONED, PAY_PER_REQUEST }
